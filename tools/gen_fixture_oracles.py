"""Regenerate spider_ray/fixture_oracles.py — frozen closed-form oracle
tables for the fixture-driven multimodal queries.

The MockWeb image/audio/video fixtures are pure functions of
(cfg.seed, i) — independent of n_pages and scale factor — so each
query's expected output is a fixed literal table filtered by the
documents row count (the only sf-dependent quantity). This script runs
the REAL stages once (DecodeStats / AudioFeatures / FrameSample / the
image codec) and freezes their outputs into SQL VALUES lists; the
committed module is then an independent record: if a codec, DSP kernel
or fixture generator drifts, the driver's value-hash gate catches it.

Run: python tools/gen_fixture_oracles.py  (rewrites the module in place)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pyarrow as pa

CRAWL_IMG_EVERY = 5


def q9(v: float) -> int:
    """floor(v*1e9 + 0.5) — the quantizer both the Ray query and these
    literals share, so equality is by construction."""
    return int(np.floor(float(v) * 1e9 + 0.5))


def main() -> None:
    from spider_ray.functions.imagecodec import decode_image, encode_image, phash64
    from spider_ray.pipelines.dedup import _to_i64
    from spider_ray.sources.fixtures import (
        MockWeb, MockWebConfig, audio_wav_for, video_for, image_pixels,
    )
    from spider_ray.stages.images import DecodeStats
    from spider_ray.stages.media import AudioFeatures, FrameSample

    # ---- image_decode_stats: i in range(0, min(500, docs), 5) ------------
    web = MockWeb(MockWebConfig(n_pages=500))
    rows = [web.expected_image_row(i) for i in range(0, 500, CRAWL_IMG_EVERY)]
    dec = DecodeStats()(pa.Table.from_pylist(rows)).to_pylist()
    decode_vals = ",\n  ".join(
        f"({i * CRAWL_IMG_EVERY}, '{r['image_id']}', {r['dec_w']}, {r['dec_h']}, "
        f"'{r['dec_fmt']}', CAST({r['dec_phash']} AS BIGINT))"
        for i, r in enumerate(dec)
    )

    # ---- crawl-image phash literals (idx, phash) for the training-table
    # oracle: the stored phash equals dec_phash (both are phash64 over the
    # decoded bytes — fixtures.expected_image_row) --------------------------
    crawl_phash_vals = ",\n  ".join(
        f"({i * CRAWL_IMG_EVERY}, CAST({r['dec_phash']} AS BIGINT))"
        for i, r in enumerate(dec)
    )

    # ---- phash_neardup: i in range(0, min(200, docs), 5) × {png,jpeg} ----
    cfg = MockWebConfig(n_pages=200)
    ph = []
    for i in range(0, 200, CRAWL_IMG_EVERY):
        pixels = image_pixels(i, cfg)
        for fmt in ("png", "jpeg"):
            data = encode_image(pixels, fmt)
            ph.append((i, f"img-{i}-{fmt}", _to_i64(phash64(decode_image(data)))))
    phash_vals = ",\n  ".join(
        f"({i}, '{iid}', CAST({p} AS BIGINT))" for i, iid, p in ph
    )

    # ---- image_fingerprints: i in range(0, min(200, docs), 5), png path --
    from spider_ray.functions.imagecodec import dct_phash64, dhash64

    fps = []
    for i in range(0, 200, CRAWL_IMG_EVERY):
        px = decode_image(encode_image(image_pixels(i, cfg), "png"))
        fps.append(
            (
                i,
                f"img-{i}",
                _to_i64(phash64(px)),
                _to_i64(dhash64(px)),
                _to_i64(dct_phash64(px)),
            )
        )
    fp_vals = ",\n  ".join(
        f"({i}, '{iid}', CAST({p} AS BIGINT), CAST({d} AS BIGINT), "
        f"CAST({c} AS BIGINT))"
        for i, iid, p, d, c in fps
    )

    # ---- consensus_neardup: both encodings × 3 hash families ------------
    cn = []
    for i in range(0, 200, CRAWL_IMG_EVERY):
        for fmt in ("png", "jpeg"):
            px = decode_image(encode_image(image_pixels(i, cfg), fmt))
            cn.append(
                (
                    i,
                    f"img-{i}-{fmt}",
                    _to_i64(phash64(px)),
                    _to_i64(dhash64(px)),
                    _to_i64(dct_phash64(px)),
                )
            )
    consensus_vals = ",\n  ".join(
        f"({i}, '{iid}', CAST({p} AS BIGINT), CAST({d} AS BIGINT), "
        f"CAST({c} AS BIGINT))"
        for i, iid, p, d, c in cn
    )

    # ---- audio_features: i in range(0, min(200, docs), 4), q9-quantized --
    cfga = MockWebConfig(n_pages=200)
    arows = [
        {"audio_id": f"a{i}", "audio_bytes": audio_wav_for(i, cfga)}
        for i in range(0, 200, 4)
    ]
    aud = AudioFeatures()(pa.Table.from_pylist(arows)).to_pylist()
    audio_vals = ",\n  ".join(
        f"({int(r['audio_id'][1:])}, '{r['audio_id']}', "
        f"CAST({q9(r['duration_s'])} AS BIGINT), CAST({q9(r['rms'])} AS BIGINT), "
        f"CAST({q9(r['zcr'])} AS BIGINT), CAST({q9(r['spectral_centroid_hz'])} AS BIGINT))"
        for r in aud
    )

    # ---- video_frames: i in range(0, min(120, docs), 8), stride 4 --------
    cfgv = MockWebConfig(n_pages=120)
    vrows = [
        {"video_id": f"v{i}", "video_bytes": video_for(i, cfgv)}
        for i in range(0, 120, 8)
    ]
    vid = FrameSample(stride=4)(pa.Table.from_pylist(vrows)).to_pylist()
    video_vals = ",\n  ".join(
        f"({int(r['video_id'][1:])}, '{r['video_id']}', {r['frame_index']}, "
        f"CAST({r['frame_phash']} AS BIGINT))"
        for r in vid
    )

    out = Path(__file__).resolve().parent.parent / "spider_ray" / "fixture_oracles.py"
    out.write_text(f'''"""FROZEN fixture-closed-form oracle SQL (generated — do not hand-edit).

Regenerate with: python tools/gen_fixture_oracles.py
See that script's docstring for why literals are a valid oracle here:
the fixtures are pure functions of (seed, i), so these are fixed
expected values; the only sf-dependent input is the documents row count,
which each query mirrors with a `least(cap, count(*))` filter.
"""

SQL_IMAGE_DECODE_STATS = """
WITH lit(idx, image_id, dec_w, dec_h, dec_fmt, dec_phash) AS (VALUES
  {decode_vals})
SELECT image_id, dec_w::BIGINT AS dec_w, dec_h::BIGINT AS dec_h, dec_fmt, dec_phash
FROM lit
WHERE idx < least(500, (SELECT count(*) FROM documents))
ORDER BY image_id
"""

SQL_PHASH_NEARDUP = """
WITH lit(idx, image_id, phash) AS (VALUES
  {phash_vals}),
live AS (
  SELECT * FROM lit WHERE idx < least(200, (SELECT count(*) FROM documents))
)
SELECT a.image_id AS id_a, b.image_id AS id_b,
       bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
FROM live a JOIN live b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
ORDER BY id_a, id_b
"""

SQL_IMAGE_FINGERPRINTS = """
WITH lit(idx, image_id, phash, dhash, dct_phash) AS (VALUES
  {fp_vals})
SELECT image_id, phash, dhash, dct_phash
FROM lit
WHERE idx < least(200, (SELECT count(*) FROM documents))
ORDER BY image_id
"""

SQL_CONSENSUS_NEARDUP = """
WITH lit(idx, image_id, phash, dhash, dct_phash) AS (VALUES
  {consensus_vals}),
live AS (
  SELECT * FROM lit WHERE idx < least(200, (SELECT count(*) FROM documents))
),
votes AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b,
         (CASE WHEN bit_count(xor(a.phash, b.phash)) <= 3 THEN 1 ELSE 0 END
        + CASE WHEN bit_count(xor(a.dhash, b.dhash)) <= 3 THEN 1 ELSE 0 END
        + CASE WHEN bit_count(xor(a.dct_phash, b.dct_phash)) <= 3 THEN 1 ELSE 0 END
         )::BIGINT AS votes
  FROM live a JOIN live b ON a.image_id < b.image_id
)
SELECT id_a, id_b, votes FROM votes WHERE votes >= 2
ORDER BY id_a, id_b
"""

SQL_AUDIO_FEATURES = """
WITH lit(idx, audio_id, duration_q9, rms_q9, zcr_q9, centroid_hz_q9) AS (VALUES
  {audio_vals})
SELECT audio_id, duration_q9, rms_q9, zcr_q9, centroid_hz_q9
FROM lit
WHERE idx < least(200, (SELECT count(*) FROM documents))
ORDER BY audio_id
"""

SQL_VIDEO_FRAMES = """
WITH lit(idx, video_id, frame_index, frame_phash) AS (VALUES
  {video_vals})
SELECT video_id, frame_index::BIGINT AS frame_index, frame_phash
FROM lit
WHERE idx < least(120, (SELECT count(*) FROM documents))
ORDER BY video_id, frame_index
"""

# VALUES fragment (idx, phash) for crawl images — composed into the
# image_training_table oracle by __ray_entry__ (needs the crawl closure
# CTE, which lives there).
LIT_CRAWL_IMAGE_PHASH = """{crawl_phash_vals}"""
''')
    print(f"wrote {out}: {len(dec)} decode rows, {len(ph)} phash rows, "
          f"{len(aud)} audio rows, {len(vid)} video rows")


if __name__ == "__main__":
    main()
