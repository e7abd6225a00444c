"""Multimodal audio/video column kernels (deterministic fake codecs).

The engine treats audio/video like images: opaque ``binary`` columns with
typed metadata, processed by vectorized kernels inside ``mapInPandas``.
Real ffmpeg-style codecs are not in this container, so the DECODE layer
is a deterministic fake — our own tiny container formats whose content is
a pure function of a seed — while everything Spark-side (schemas, batch
shapes, UDF signatures, partitioning) is real and tested. Swapping in a
real decoder is a one-function change per format.

Formats:
* video ``SVID``: header (magic, n_frames, w, h as int32 LE) followed by
  one int64 seed per frame; frame pixels = images.synth_image(seed, w, h).
* audio ``SAUD``: header (magic, n_samples, sample_rate int32 LE)
  followed by int16 PCM samples (seeded splitmix noise + a seed-keyed
  tone, so spectral features differ per clip).

Reference analog: media URLs fetched as opaque payloads and mirrored
(/root/reference/twitter/timer_twitter.py:152-158 picks max-bitrate
video variants; /root/reference/utils/qiniu_upload.py mirrors binaries).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64
from .images import phash64, synth_image

_U64 = np.uint64
VIDEO_MAGIC = b"SVID"
AUDIO_MAGIC = b"SAUD"


# ---------- video ----------
def encode_video(seed: int, n_frames: int, w: int, h: int) -> bytes:
    """Deterministic video container: per-frame seeds derived from seed."""
    head = VIDEO_MAGIC + np.array([n_frames, w, h], "<i4").tobytes()
    frame_seeds = splitmix64(
        np.uint64(seed) + np.arange(1, n_frames + 1, dtype=_U64)
    ).view(np.int64)
    return head + frame_seeds.tobytes()


def decode_video(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (w, h, frame_seeds). Raises ValueError on a foreign container —
    the hook where a real decoder would take over."""
    if data[:4] != VIDEO_MAGIC:
        raise ValueError("not an SVID container (real codecs not bundled)")
    n, w, h = np.frombuffer(data[4:16], "<i4")
    seeds = np.frombuffer(data[16 : 16 + 8 * n], "<i8")
    return int(w), int(h), seeds


def video_frame(data: bytes, idx: int) -> np.ndarray:
    w, h, seeds = decode_video(data)
    return synth_image(int(seeds[idx]), w, h)


def sample_frames(data: bytes, k: int) -> list[int]:
    """Evenly spaced frame indices (first frame always included)."""
    _w, _h, seeds = decode_video(data)
    n = len(seeds)
    if n == 0:
        return []
    k = min(k, n)
    return sorted({int(round(i * (n - 1) / max(k - 1, 1))) for i in range(k)})


def video_frame_phashes(data: bytes, k: int) -> list[int]:
    """phash64 of k evenly sampled frames — the dedup-ready video sketch."""
    w, h, seeds = decode_video(data)
    return [int(phash64(synth_image(int(seeds[i]), w, h))) for i in sample_frames(data, k)]


# ---------- audio ----------
def encode_audio(seed: int, n_samples: int, sample_rate: int = 16000) -> bytes:
    head = AUDIO_MAGIC + np.array([n_samples, sample_rate], "<i4").tobytes()
    noise = (
        splitmix64(np.uint64(seed) ^ np.arange(n_samples, dtype=_U64))
        .astype(np.float64) / 2**64 - 0.5
    )
    tone_hz = 100 + int(seed) % 900
    t = np.arange(n_samples) / sample_rate
    wave = 0.3 * np.sin(2 * np.pi * tone_hz * t) + 0.1 * noise
    pcm = np.clip(wave * 32767, -32768, 32767).astype("<i2")
    return head + pcm.tobytes()


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    """→ (sample_rate, float samples in [-1,1]); ValueError on foreign data."""
    if data[:4] != AUDIO_MAGIC:
        raise ValueError("not an SAUD container (real codecs not bundled)")
    n, rate = np.frombuffer(data[4:12], "<i4")
    pcm = np.frombuffer(data[12 : 12 + 2 * n], "<i2")
    return int(rate), pcm.astype(np.float64) / 32767.0


def audio_features(data: bytes) -> dict[str, float]:
    """Cheap spectral-ish features: RMS, zero-crossing rate, peak, and the
    dominant-bin frequency from a numpy rFFT — all deterministic."""
    rate, x = decode_audio(data)
    if len(x) == 0:
        return {"rms": 0.0, "zcr": 0.0, "peak": 0.0, "dom_hz": 0.0}
    zc = np.count_nonzero(np.diff(np.signbit(x)))
    spec = np.abs(np.fft.rfft(x))
    dom = float(np.argmax(spec[1:]) + 1) * rate / len(x)
    return {
        "rms": float(np.sqrt(np.mean(x * x))),
        "zcr": float(zc / len(x)),
        "peak": float(np.max(np.abs(x))),
        "dom_hz": dom,
    }


# ---------- image resize (real) ----------
def resize_nearest(px: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W[, C]) uint8 array — the real
    kernel behind the thumbnail/feature-extract path."""
    src_h, src_w = px.shape[:2]
    rows = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    cols = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return px[rows][:, cols]
