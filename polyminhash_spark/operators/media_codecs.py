"""Pure-Python/numpy media decoders — the real-decode layer behind
operators/multimodal.py for formats that need no external libraries:

* PGM / PPM (netpbm P5/P6, 8-bit) — image decode to an HxWxC uint8
  array, pure byte parsing + numpy reshape.
* WAV (PCM 8/16-bit) — audio decode to (n_samples, n_channels) float32
  in [-1, 1], via the stdlib `wave` module + numpy.

Formats that genuinely need external codecs (JPEG/PNG/MP3/MP4) still
raise NotImplementedError with the plug-in point named — the honest
boundary, not a stub pretending.

Feature extraction (deterministic, resolution-independent):
* image: 4x4 mean-luma grid (16 dims) — a tiny perceptual sketch, the
  same family as blockhash perceptual hashes.
* audio: 16 equal-time-bucket RMS envelope (16 dims).
Both are pure numpy over the decoded array — no per-pixel Python.
"""

from __future__ import annotations

import io
import wave

import numpy as np

FEATURE_DIM = 16


# --- netpbm (PGM P5 / PPM P6) ------------------------------------------------

def decode_netpbm(payload: bytes) -> np.ndarray:
    """P5 (gray) / P6 (rgb) 8-bit binary netpbm -> uint8 array
    (h, w) or (h, w, 3)."""
    if not payload.startswith((b"P5", b"P6")):
        raise ValueError("not a binary netpbm payload")
    channels = 3 if payload[:2] == b"P6" else 1

    # header = magic, width, height, maxval as whitespace-separated
    # tokens, '#' comments allowed; pixel data follows the single
    # whitespace after maxval
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    n = w * h * channels
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape((h, w, 3)) if channels == 3 else arr.reshape((h, w))


def encode_pgm(img: np.ndarray) -> bytes:
    """Test helper: (h, w) uint8 -> P5 bytes."""
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_ppm(img: np.ndarray) -> bytes:
    """Test helper: (h, w, 3) uint8 -> P6 bytes."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def image_grid_feature(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """4x4 mean-luma grid in [0, 1] — resize-invariant perceptual
    sketch (blockhash family), float32[grid*grid]."""
    if img.ndim == 3:
        luma = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                                 dtype=np.float32)
    else:
        luma = img.astype(np.float32)
    h, w = luma.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    out = np.empty(grid * grid, dtype=np.float32)
    for gy in range(grid):
        for gx in range(grid):
            cell = luma[ys[gy]:max(ys[gy + 1], ys[gy] + 1),
                        xs[gx]:max(xs[gx + 1], xs[gx] + 1)]
            out[gy * grid + gx] = float(cell.mean()) / 255.0
    return out


# --- WAV (PCM) ---------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> ((n_samples, n_channels) float32 in [-1, 1], rate)."""
    with wave.open(io.BytesIO(payload)) as wf:
        nch, sw, rate, nframes = (wf.getnchannels(), wf.getsampwidth(),
                                  wf.getframerate(), wf.getnframes())
        raw = wf.readframes(nframes)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{sw * 8}-bit PCM not supported")
    return x.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Test helper: (n, ch) float32 [-1, 1] -> 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            (np.clip(samples, -1, 1) * 32767.0).astype("<i2").tobytes())
    return buf.getvalue()


def audio_envelope_feature(samples: np.ndarray, buckets: int = 16) -> np.ndarray:
    """RMS envelope over `buckets` equal time slices, float32[buckets]."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return np.zeros(buckets, dtype=np.float32)
    edges = (np.arange(buckets + 1) * n) // buckets
    out = np.empty(buckets, dtype=np.float32)
    for b in range(buckets):
        seg = mono[edges[b]:max(edges[b + 1], edges[b] + 1)]
        out[b] = float(np.sqrt(np.mean(seg.astype(np.float64) ** 2)))
    return out


# --- dispatch ----------------------------------------------------------------

def real_decode_feature(payload: bytes, mime: str) -> np.ndarray:
    """mime-dispatched decode + feature-extract, FEATURE_DIM floats."""
    if mime in ("image/x-portable-graymap", "image/x-portable-pixmap"):
        return image_grid_feature(decode_netpbm(payload))
    if mime in ("audio/wav", "audio/x-wav"):
        samples, _ = decode_wav(payload)
        return audio_envelope_feature(samples)
    raise NotImplementedError(
        f"no built-in decoder for {mime!r}; external codecs (PIL/librosa/"
        "ffmpeg) plug in here — this container ships none")
