"""Real decoders for uncompressed media formats (pure stdlib + numpy).

The container has no PIL/ffmpeg/torchaudio, so compressed formats
(JPEG/MP3/H.264) stay honestly stubbed in ``operators/multimodal.py``
— but nothing stops REAL decode paths for the uncompressed formats a
training pipeline meets constantly as intermediates:

* WAV (RIFF, PCM16): header walk + ``numpy.frombuffer`` → duration,
  RMS energy, peak, zero-crossing rate — the standard audio-quality
  gate features.
* PPM (P6, 8-bit RGB): header parse + reshape → dimensions, channel
  means, luminance stats; nearest-neighbor resize by integer index
  sampling — exact, deterministic, no resampling-kernel ambiguity.

Encoders exist so tests synthesize known signals (a sine wave, a
gradient) and assert decoded features against closed-form values.
All math is numpy float64 on exact integer samples — deterministic
across runs and partitions.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --- WAV (RIFF PCM16) ----------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal RIFF/WAVE writer: mono or (n, channels) int16 PCM."""
    pcm = np.asarray(samples, dtype="<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n_ch = pcm.shape[1]
    data = pcm.tobytes()
    byte_rate = sample_rate * n_ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(blob: bytes) -> dict:
    """Parse RIFF/WAVE PCM16 and compute audio-gate features.

    Walks chunks (so extra LIST/INFO chunks don't break parsing),
    rejects non-PCM encodings loudly. Multi-channel audio is averaged
    to mono (float64) before the signal stats.
    """
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) != size:
            # a header declaring more bytes than exist is a truncated
            # transfer — computing features from the partial PCM would
            # silently pass corrupt media through the quality gate
            raise ValueError(
                f"truncated {cid!r} chunk: declared {size}, have {len(body)}"
            )
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"fmt chunk truncated ({len(body)} bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    if n_ch < 1 or rate < 1:
        # a zero here would surface as ZeroDivisionError deep in the
        # stats — the quarantine contract is ValueError, always
        raise ValueError(f"invalid fmt chunk (channels={n_ch}, rate={rate})")
    pcm = np.frombuffer(data, dtype="<i2")
    n_frames = len(pcm) // n_ch
    mono = (
        pcm[: n_frames * n_ch]
        .reshape(n_frames, n_ch)
        .mean(axis=1, dtype=np.float64)
    )
    # normalize to [-1, 1] full scale
    x = mono / 32768.0
    zc = int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n_frames > 1 else 0
    return {
        "sample_rate": int(rate),
        "n_channels": int(n_ch),
        "n_samples": int(n_frames),
        "duration_s": n_frames / rate,
        "rms": float(math.sqrt(float(np.mean(x * x)))) if n_frames else 0.0,
        "peak": float(np.max(np.abs(x))) if n_frames else 0.0,
        "zero_cross_rate": zc / max(n_frames - 1, 1),
    }


# --- PPM (P6 binary, 8-bit) ---------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """Minimal P6 writer for an (h, w, 3) uint8 array."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def _ppm_header(blob: bytes) -> tuple[int, int, int]:
    """Parse the P6 header (whitespace/comment tolerant); returns
    (width, height, offset-of-pixel-data)."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    if fields[2] != 255:
        raise ValueError("only 8-bit (maxval 255) PPM supported")
    return fields[0], fields[1], pos + 1  # single whitespace after maxval


def decode_ppm(blob: bytes) -> dict:
    w, h, off = _ppm_header(blob)
    px = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=off)
    img = px.reshape(h, w, 3).astype(np.float64)
    lum = img @ np.array([0.299, 0.587, 0.114])
    return {
        "width": w,
        "height": h,
        "mean_r": float(img[:, :, 0].mean()),
        "mean_g": float(img[:, :, 1].mean()),
        "mean_b": float(img[:, :, 2].mean()),
        "mean_luma": float(lum.mean()),
        "std_luma": float(lum.std()),
    }


def resize_ppm(blob: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize, P6 in → P6 out.

    Index sampling (floor((i + 0.5) * src/dst)) — exact integer
    arithmetic per output pixel, so the result is bit-identical
    everywhere, unlike kernel-based resamplers whose float rounding
    varies by library build.
    """
    w, h, off = _ppm_header(blob)
    px = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=off)
    img = px.reshape(h, w, 3)
    ys = ((np.arange(height) * 2 + 1) * h) // (2 * height)
    xs = ((np.arange(width) * 2 + 1) * w) // (2 * width)
    out = img[ys][:, xs]
    return encode_ppm(out)
