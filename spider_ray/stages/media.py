"""Multimodal actor-pool stages: audio features + video frame sampling.

Both are callable classes for ``ds.map_batches(Cls, concurrency=N,
batch_size=B)`` over binary columns (the brief's multimodal-column
contract: opaque ``binary`` payload + typed metadata, decode inside
actor-pool stages, small batches for large blobs).

- ``AudioFeatures`` — REAL decode (stdlib WAV, functions.avcodec) →
  numpy DSP features: duration, RMS, zero-crossing rate, spectral
  centroid/rolloff from an rfft. This is the exact shape a
  soundfile/librosa-backed stage would have; only the container format is
  narrower (16-bit mono PCM).
- ``FrameSample`` — strided frame extraction from the SRV1 container
  (functions.avcodec): header-seek past unsampled frames (no decode),
  REAL image decode + phash for sampled ones; emits one row per sampled
  frame (``flat_map`` shape: a video row explodes into frame rows).

These replace the r1 ``NotImplementedError`` stubs — the codecs this
container lacks (ffmpeg) are isolated behind ``avcodec``'s container
functions, everything Ray-side is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.avcodec import decode_wav, is_video, is_wav, iter_video_frames, video_info
from ..functions.imagecodec import phash64, to_gray


class AudioFeatures:
    """binary WAV column → per-row audio features (stateful: window
    function precomputed once per actor)."""

    def __init__(self, bytes_col: str = "audio_bytes", n_fft: int = 1024):
        self.bytes_col = bytes_col
        self.n_fft = n_fft
        self.window = np.hanning(n_fft)  # once per actor, not per batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.bytes_col).to_pylist()
        out = {
            "duration_s": [], "rms": [], "zcr": [],
            "spectral_centroid_hz": [], "spectral_rolloff_hz": [],
        }
        for blob in blobs:
            if blob is None or not is_wav(blob):
                for k in out:
                    out[k].append(None)
                continue
            samples, rate = decode_wav(blob)
            n = len(samples)
            out["duration_s"].append(n / rate)
            out["rms"].append(float(np.sqrt(np.mean(samples**2))) if n else 0.0)
            out["zcr"].append(
                float(np.mean(np.abs(np.diff(np.signbit(samples))))) if n > 1 else 0.0
            )
            if n >= self.n_fft:
                seg = samples[: self.n_fft] * self.window
                mag = np.abs(np.fft.rfft(seg))
                freqs = np.fft.rfftfreq(self.n_fft, d=1.0 / rate)
                total = mag.sum()
                centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
                cum = np.cumsum(mag)
                roll_idx = int(np.searchsorted(cum, 0.85 * total))
                rolloff = float(freqs[min(roll_idx, len(freqs) - 1)])
            else:
                centroid = rolloff = 0.0
            out["spectral_centroid_hz"].append(centroid)
            out["spectral_rolloff_hz"].append(rolloff)
        for name, values in out.items():
            batch = batch.append_column(name, pa.array(values, pa.float64()))
        return batch


class FrameSample:
    """binary SRV1 video column → one row per sampled frame
    (id, frame_index, ts_s, frame phash, mean luma)."""

    def __init__(
        self, bytes_col: str = "video_bytes", id_col: str = "video_id",
        stride: int = 5,
    ):
        self.bytes_col = bytes_col
        self.id_col = id_col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        blobs = batch.column(self.bytes_col).to_pylist()
        out = {
            "video_id": [], "frame_index": [], "ts_s": [],
            "frame_phash": [], "mean_luma": [],
        }
        from ..pipelines.dedup import _to_i64

        for vid, blob in zip(ids, blobs):
            if blob is None or not is_video(blob):
                continue
            _n, fps = video_info(blob)
            for idx, pixels in iter_video_frames(blob, self.stride):
                out["video_id"].append(vid)
                out["frame_index"].append(idx)
                out["ts_s"].append(idx / max(1, fps))
                out["frame_phash"].append(_to_i64(phash64(pixels)))
                out["mean_luma"].append(float(to_gray(pixels).mean()))
        return pa.table(
            {
                "video_id": pa.array(out["video_id"], pa.string()),
                "frame_index": pa.array(out["frame_index"], pa.int32()),
                "ts_s": pa.array(out["ts_s"], pa.float64()),
                "frame_phash": pa.array(out["frame_phash"], pa.int64()),
                "mean_luma": pa.array(out["mean_luma"], pa.float64()),
            }
        )
