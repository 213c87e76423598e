"""Multimodal column handling: opaque binary media + typed metadata.

Pattern: media travels as a `binary` column with a `media_type` tag;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each task processes a columnar batch of blobs
without JVM round-trips per row. Real codec libraries (PIL, torchaudio,
ffmpeg) are not in this container — decoders for COMPRESSED media
(jpeg/mp3/h264) are STUBS raising NotImplementedError. Uncompressed
formats decode for REAL (`operators/codecs.py`, pure stdlib+numpy):
``media_type="wav"`` parses RIFF/PCM16 and emits duration/RMS/peak/
zero-cross features; ``"ppm"`` parses P6 RGB and emits dimension/
channel/luma stats, with an exact nearest-neighbor resize path. The
Spark-side plumbing (schema, batch iteration, partitioning) is also
exercised via the deterministic ``fake`` decoder (md5-derived
features), which the DuckDB oracle can mirror exactly.

100 TB notes: blobs stay in executor memory one Arrow batch at a time
(`spark.sql.execution.arrow.maxRecordsPerBatch` bounds peak usage);
feature extraction is a narrow map — no shuffle; write features
columnar and drop the blob as early as the pipeline allows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

N_FAKE_FEATURES = 4

FEATURE_SCHEMA = (
    "media_type string, n_bytes long, "
    + ", ".join(f"f{i} double" for i in range(N_FAKE_FEATURES))
)


def fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for a codec: md5-derived unit-interval
    features (oracle mirror: ('0x'||substr(md5(i||'|'||md5(blob)),1,6))::BIGINT/16777216.0)."""
    h = hashlib.md5(blob).hexdigest()
    feats = {
        f"f{i}": round(
            int(hashlib.md5(f"{i}|{h}".encode()).hexdigest()[:6], 16) / 16**6, 6
        )
        for i in range(N_FAKE_FEATURES)
    }
    return {"n_bytes": len(blob), **feats}


def image_decode(blob: bytes) -> dict:  # pragma: no cover - stub
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in this container); "
        "plug a real decoder with the same dict contract"
    )


def audio_decode(blob: bytes) -> dict:  # pragma: no cover - stub
    raise NotImplementedError("audio decode requires soundfile/torchaudio")


def video_frame_sample(blob: bytes) -> dict:  # pragma: no cover - stub
    raise NotImplementedError("video frame sampling requires ffmpeg")


def wav_decode(blob: bytes) -> dict:
    """REAL audio decode (RIFF/PCM16, operators/codecs.py) mapped onto
    the generic feature slots: duration, RMS, zero-cross rate, peak."""
    from dsp_spark.operators import codecs

    m = codecs.decode_wav(blob)
    return {
        "n_bytes": len(blob),
        "f0": m["duration_s"],
        "f1": m["rms"],
        "f2": m["zero_cross_rate"],
        "f3": m["peak"],
    }


def ppm_decode(blob: bytes) -> dict:
    """REAL image decode (P6 PPM, operators/codecs.py): dimensions and
    unit-scaled luminance stats in the generic feature slots."""
    from dsp_spark.operators import codecs

    m = codecs.decode_ppm(blob)
    return {
        "n_bytes": len(blob),
        "f0": float(m["width"]),
        "f1": float(m["height"]),
        "f2": m["mean_luma"] / 255.0,
        "f3": m["std_luma"] / 255.0,
    }


DECODERS: dict[str, Callable[[bytes], dict]] = {
    "fake": fake_decode,
    "image": image_decode,
    "audio": audio_decode,
    "video": video_frame_sample,
    "wav": wav_decode,
    "ppm": ppm_decode,
}


FRAME_SCHEMA = "frame_idx int, frame_hash string, frame_score double"


def fake_frame(blob: bytes, idx: int) -> dict:
    """Deterministic stand-in for one sampled frame (md5-derived)."""
    h = hashlib.md5(blob).hexdigest()
    fh = hashlib.md5(f"frame{idx}|{h}".encode()).hexdigest()
    return {
        "frame_idx": idx,
        "frame_hash": fh,
        "frame_score": round(int(fh[:6], 16) / 16**6, 6),
    }


def sample_frames(
    df: DataFrame,
    *,
    id_col: str,
    media_col: str,
    n_frames: int = 3,
    media_type: str = "fake",
) -> DataFrame:
    """1->N frame sampling over a binary media column (mapInPandas).

    The video path is the stub (`video_frame_sample`); the fake decoder
    exercises the real plumbing: each input row yields `n_frames` output
    rows — the batch iterator shape a real ffmpeg sampler needs (one
    blob in, a frame table out), with blobs held one Arrow batch at a
    time.
    """
    if media_type not in ("fake", "video"):
        raise ValueError(f"frame sampling needs fake|video, got {media_type!r}")
    id_field = df.schema[id_col]
    id_ddl = f"{id_col} {id_field.dataType.simpleString()}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                data = bytes(blob)
                if media_type == "video":  # pragma: no cover - stub
                    video_frame_sample(data)
                for i in range(n_frames):
                    rec = fake_frame(data, i)
                    rec[id_col] = rid
                    rows.append(rec)
            yield pd.DataFrame(rows)

    return df.select(id_col, media_col).mapInPandas(
        run, schema=f"{id_ddl}, {FRAME_SCHEMA}"
    )


def image_resize(blob: bytes, width: int, height: int) -> bytes:  # pragma: no cover - stub
    raise NotImplementedError(
        "image resize requires PIL/opencv (not in this container); "
        "plug a real resizer with the same bytes->bytes contract"
    )


def fake_resize(blob: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a resizer: width*height bytes from a
    repeated md5 chain (oracle mirror:
    substr(repeat(md5(text), ceil(w*h/32)), 1, w*h))."""
    n = width * height
    s = hashlib.md5(blob).hexdigest()
    return (s * ((n + 31) // 32))[:n].encode()


def resize_media(
    df: DataFrame,
    *,
    id_col: str,
    media_col: str,
    width: int,
    height: int,
    media_type: str = "fake",
) -> DataFrame:
    """bytes->bytes media resize over a binary column (mapInPandas).

    The image path is the stub (`image_resize`); the fake resizer
    exercises the real plumbing — blobs in, fixed-size blobs out, one
    Arrow batch at a time, narrow map with no shuffle. Output replaces
    the media column with the resized bytes plus (out_w, out_h).
    """
    if media_type not in ("fake", "image", "ppm"):
        raise ValueError(f"resize needs fake|image|ppm, got {media_type!r}")
    id_field = df.schema[id_col]
    id_ddl = f"{id_col} {id_field.dataType.simpleString()}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dsp_spark.operators import codecs

        for pdf in batches:
            ids, blobs = [], []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                data = bytes(blob)
                if media_type == "image":  # pragma: no cover - stub
                    out = image_resize(data, width, height)
                elif media_type == "ppm":  # REAL nearest-neighbor resize
                    out = codecs.resize_ppm(data, width, height)
                else:
                    out = fake_resize(data, width, height)
                ids.append(rid)
                blobs.append(out)
            yield pd.DataFrame(
                {id_col: ids, "media": blobs, "out_w": width, "out_h": height}
            )

    return df.select(id_col, media_col).mapInPandas(
        run, schema=f"{id_ddl}, media binary, out_w int, out_h int"
    )


def extract_features(
    df: DataFrame,
    *,
    id_col: str,
    media_col: str,
    media_type: str = "fake",
    extra_schema: str = "",
) -> DataFrame:
    """mapInPandas feature extraction over a binary media column.

    Output: id_col + FEATURE_SCHEMA columns. Unknown media types fail
    fast at plan-build time, not per-task.
    """
    if media_type not in DECODERS:
        raise ValueError(f"unknown media_type {media_type!r}; have {sorted(DECODERS)}")
    decoder = DECODERS[media_type]
    id_field = df.schema[id_col]
    id_ddl = f"{id_col} {id_field.dataType.simpleString()}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                rec = decoder(bytes(blob))
                rec[id_col] = rid
                rec["media_type"] = media_type
                rows.append(rec)
            yield pd.DataFrame(rows)

    schema = f"{id_ddl}, {FEATURE_SCHEMA}"
    if extra_schema:
        schema += f", {extra_schema}"
    return df.select(id_col, media_col).mapInPandas(run, schema=schema)
