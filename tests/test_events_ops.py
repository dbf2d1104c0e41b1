"""Unit tests for the promoted event-stream operators
(spider_ray.pipelines.events) against closed-form pandas oracles."""

import numpy as np
import pandas as pd
import pytest

import ray

from spider_ray.pipelines.events import (
    distinct_values,
    grouped_topk,
    hash_sample,
    sessionize,
    sliding_window_counts,
)


@pytest.fixture()
def events_ds(ray_session):
    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, 20, n),
            "ts": np.sort(rng.integers(0, 10**10, n)),
            "value": rng.integers(0, 1000, n),
        }
    )
    return df, ray.data.from_pandas(df)


def test_sessionize_matches_pandas(events_ds):
    df, ds = events_ds
    gap = 30 * 60 * 1_000_000
    out = sessionize(ds, gap_us=gap).to_pandas()
    expected_total = 0
    for _, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        brk = (g["ts"].diff() > gap).fillna(False)
        expected_total += int(brk.sum()) + 1
    assert len(out) == expected_total
    assert out["n_events"].sum() == len(df)


def test_sliding_window_matches_pandas(events_ds):
    df, ds = events_ds
    win = 10**8
    out = sliding_window_counts(ds, window_us=win).to_pandas()
    merged = out.set_index("event_id")["n_in_window"]
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        for pos, (eid, t) in enumerate(zip(g["event_id"], ts)):
            expected = int(((ts > t - win) & (ts <= t)).sum())
            assert merged[eid] == expected
        break  # one full group is enough for the closed-form check


def test_grouped_topk(events_ds):
    df, ds = events_ds
    out = grouped_topk(
        ds, "user_id", "value", "event_id", k=2,
        keep_cols=["user_id", "event_id", "value"],
    ).to_pandas()
    for uid, g in df.groupby("user_id"):
        expected = g.sort_values(["value", "event_id"], ascending=[False, True]).head(2)
        got = out[out["user_id"] == uid].sort_values(
            ["value", "event_id"], ascending=[False, True]
        )
        assert got["event_id"].tolist() == expected["event_id"].tolist()


def test_distinct_and_hash_sample(events_ds):
    df, ds = events_ds
    t = distinct_values(ds, "user_id")
    assert t.column("user_id").to_pylist() == sorted(df["user_id"].unique())
    sampled = hash_sample(ds, "event_id", buckets=16).to_pandas()
    assert 0 < len(sampled) < len(df)
    # reproducible: second run identical
    again = hash_sample(ds, "event_id", buckets=16).to_pandas()
    assert sorted(sampled["event_id"]) == sorted(again["event_id"])


def test_asof_join_matches_pandas(events_ds):
    """Bucketed as-of join ≡ a global pandas merge_asof."""
    import pyarrow as pa

    from spider_ray.pipelines.relational import asof_join

    df, ds = events_ds
    snaps_df = (
        df[df["event_id"] % 7 == 0][["user_id", "ts", "value"]]
        .groupby(["user_id", "ts"], as_index=False)["value"].max()
        .rename(columns={"value": "snap_value"})
    )
    left = ds.map_batches(
        lambda t: t.select(["event_id", "user_id", "ts"]), batch_format="pyarrow"
    )
    snaps = ray.data.from_pandas(snaps_df)
    out = asof_join(
        left, snaps, key="user_id", ts="ts",
        left_cols=["event_id"], right_cols=["snap_value"],
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    expected = pd.merge_asof(
        df[["event_id", "user_id", "ts"]].sort_values("ts", kind="mergesort"),
        snaps_df.assign(ts_right=snaps_df["ts"]).sort_values("ts", kind="mergesort"),
        on="ts", by="user_id", direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    assert len(out) == len(expected)

    def norm(frame):
        ts_right = pd.to_datetime(frame["ts_right"]).fillna(pd.Timestamp(0))
        return pd.DataFrame(
            {
                "event_id": frame["event_id"].astype("int64"),
                "snap_value": frame["snap_value"].astype("float64").fillna(-1.0),
                "ts_right": ts_right.astype("datetime64[us]").astype("int64"),
            }
        ).reset_index(drop=True)

    assert norm(out).equals(norm(expected))
