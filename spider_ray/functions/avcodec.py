"""Audio / video codecs for the multimodal stages.

- **Audio is REAL**: RIFF/WAVE PCM encode+decode via the stdlib ``wave``
  module (no external audio libs needed) — 16-bit mono PCM in, numpy
  float waveform out. Feature extraction (stages.media.AudioFeatures) is
  plain numpy DSP.
- **Video** uses a deterministic container of this repo's own making
  (``SRV1``: a length-prefixed concatenation of encoded PNG/JPEG frames)
  because no ffmpeg/pyav exists in this container. The container is a
  stand-in, but everything around it — binary column plumbing, per-frame
  REAL image decode, frame striding, per-frame phash — is the exact
  Ray-side shape an ffmpeg-backed stage would use behind the same seam
  (the brief's "make the plumbing real and tested; stub the codec").

Format SRV1: ``b"SRV1" | n_frames:u32 | fps:u16 | {len:u32 | frame}*``.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from .imagecodec import decode_image, encode_image

# ---------------------------------------------------------------------------
# audio (REAL wav)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """float waveform in [-1, 1] (or int16) → 16-bit mono PCM WAV bytes."""
    if samples.dtype != np.int16:
        samples = np.clip(samples, -1.0, 1.0)
        samples = (samples * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 waveform in [-1, 1], sample rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("only 16-bit mono PCM supported")
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    samples = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32767.0
    return samples, rate


def is_wav(data: bytes) -> bool:
    return len(data) > 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


# ---------------------------------------------------------------------------
# video (SRV1 frame container over the real image codecs)
# ---------------------------------------------------------------------------

_SRV1_MAGIC = b"SRV1"


def encode_video(frames: list[np.ndarray], fps: int = 10, fmt: str = "png") -> bytes:
    """Frames (h, w, 3) uint8 → SRV1 container bytes."""
    parts = [_SRV1_MAGIC, struct.pack("<IH", len(frames), fps)]
    for frame in frames:
        blob = encode_image(frame, fmt)
        parts.append(struct.pack("<I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def video_info(data: bytes) -> tuple[int, int]:
    """(n_frames, fps) from the header only — no frame decode."""
    if data[:4] != _SRV1_MAGIC:
        raise ValueError("not an SRV1 container")
    n, fps = struct.unpack_from("<IH", data, 4)
    return n, fps


def iter_video_frames(data: bytes, stride: int = 1):
    """Yield (frame_index, decoded pixels) for every ``stride``-th frame.

    Non-selected frames are SKIPPED without decoding (only the length
    prefix is read) — the seek-don't-decode behavior a real keyframe
    sampler relies on."""
    n, _fps = video_info(data)
    off = 10
    for i in range(n):
        (length,) = struct.unpack_from("<I", data, off)
        off += 4
        if i % stride == 0:
            yield i, decode_image(data[off : off + length])
        off += length


def is_video(data: bytes) -> bool:
    return data[:4] == _SRV1_MAGIC
