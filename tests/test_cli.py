"""`python -m spider_ray` job-driver CLI (the `ray job submit` surface)."""

import json
import os
import subprocess
import sys


def _run(args, **kw):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("RAY_ADDRESS", None)  # own a fresh local session per invocation
    return subprocess.run(
        [sys.executable, "-m", "spider_ray", *args],
        capture_output=True, text=True, timeout=420, env=env, **kw,
    )


def test_cli_crawl_and_resume(tmp_path):
    out = str(tmp_path / "crawl")
    r = _run(
        ["crawl", "--out", out, "--pages", "500", "--workers", "2",
         "--max-epochs", "64"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["pages_fetched"] == 500
    assert payload["seen_size"] == 500

    r2 = _run(
        ["crawl", "--out", out, "--pages", "500", "--workers", "2",
         "--max-epochs", "64", "--resume"]
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    payload2 = json.loads(r2.stdout.strip().splitlines()[-1])
    # universe already complete: nothing refetched, seen set restored
    assert payload2["pages_fetched"] == 0
    assert payload2["seen_size"] == 500


def test_cli_query_unknown_name():
    r = _run(["query", "no_such_query"])
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_cli_sitemap_seeding_and_diff(tmp_path):
    """crawl --seed-from-sitemaps seeds the full declared inventory;
    diff between two runs reports change-type counts (identical
    universes → all unchanged)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        r = _run(
            ["crawl", "--out", out, "--pages", "120", "--workers", "2",
             "--max-epochs", "8", "--seed-from-sitemaps"]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        # every page is a seed → whole universe in epoch 0 (+1 for images)
        assert payload["epochs"] <= 2
        assert payload["pages_fetched"] >= 120
    r = _run(["diff", "--old", a, "--new", b,
              "--out", str(tmp_path / "d.parquet")])
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])["counts"]
    assert set(counts) == {"unchanged"}
    import pyarrow.parquet as pq

    table = pq.read_table(str(tmp_path / "d.parquet"))
    assert table.num_rows == counts["unchanged"]
    assert set(table.column_names) == {"url", "change_type"}
