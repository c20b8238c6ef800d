"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
UDFs over ``mapInPandas``. The actual codecs are NOT in this container,
so the decode step is STUBBED: ``decode_stub=True`` produces a
deterministic fake (hash-derived bytes/features) and ``decode_stub=False``
raises ``NotImplementedError`` at the exact seam where a real libvips /
ffmpeg / soundfile call plugs in. The Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested.

≙ the reference's AudioFileLoader boundary (design.md:451-475): bytes in,
typed arrays out, NumPy at the I/O seam.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)

FEATURE_ERR_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType(), False), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)


def _decode_real(payload: bytes, modality: str) -> np.ndarray:
    """The real-decoder seam. ALL FOUR reference audio formats decode
    for real with pure numpy/stdlib: RIFF/PCM WAV, FLAC, MPEG Layers
    I/II/III, and Ogg Vorbis (multimodal/wav.py, flac.py,
    mpeg_decode.py + mpeg_layer3.py, vorbis.py), as do BMP/PNG images
    (image.py). Remaining seams: Vorbis floor0 / residues 0-1 / window
    switching, MP3 transition windows + intensity stereo, Opus, and
    video frame decode (ffmpeg-class) — container metadata for all of
    those IS parsed (multimodal/probe.py).
    """
    if modality == "audio":
        if payload[:4] == b"fLaC":
            from audio_feature_extraction_spark.multimodal.flac import decode_flac

            signal, _sr = decode_flac(payload)
            return signal
        if payload[:4] == b"OggS":
            from audio_feature_extraction_spark.multimodal.vorbis import (
                decode_vorbis_samples,
            )

            signal, _sr = decode_vorbis_samples(payload)
            return signal
        if payload[:3] == b"ID3" or (
            len(payload) >= 2
            and payload[0] == 0xFF
            and (payload[1] & 0xE0) == 0xE0
        ):
            # MPEG audio: Layers I, II and III all decode for real
            # (mpeg_decode + mpeg_layer3); the remaining codec seams are
            # Layer III short blocks and intensity stereo
            from audio_feature_extraction_spark.multimodal.mpeg_decode import (
                decode_mpeg_samples,
            )

            signal, _sr = decode_mpeg_samples(payload)
            return signal
        from audio_feature_extraction_spark.multimodal.wav import decode_wav

        signal, _sr = decode_wav(payload)  # LoadError on non-WAV bytes
        return signal
    if modality == "image":
        from audio_feature_extraction_spark.multimodal.image import decode_image

        return decode_image(payload).ravel()  # row-major luminance scan
    if modality == "video":
        # MJPEG-in-AVI decodes for real (AVI walk -> per-frame baseline
        # JPEG -> luminance motion signal); inter-coded codecs raise
        # LoadError at the documented ffmpeg-class seam inside
        from audio_feature_extraction_spark.multimodal.video import (
            video_motion_signal,
        )

        return video_motion_signal(payload)
    raise NotImplementedError(
        f"no {modality} codec in this environment — install ffmpeg "
        f"and implement _decode_real"
    )


def _signal_features(signal: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-width summary of a variable-length decoded signal: mean of
    |x| over ``dim`` equal segments (zero for segments past the end)."""
    out = np.zeros(dim, dtype=np.float64)
    n = len(signal)
    if n == 0:
        return out
    a = np.abs(np.asarray(signal, dtype=np.float64))
    bounds = (np.arange(dim + 1) * n) // dim
    for j in range(dim):
        lo, hi = int(bounds[j]), int(bounds[j + 1])
        if hi > lo:
            out[j] = a[lo:hi].mean()
    return out


def _decode_fake(payload: bytes, modality: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in: sha256-derived pseudo-signal. Stable across
    runs/engines; lets the full pipeline (batching, schema, downstream
    aggregation) run end-to-end without codecs."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 8) // len(h) + 1))[: dim * 8], dtype=np.uint64)
    return (raw % 10_000).astype(np.float64) / 10_000.0


def extract_media_features(
    media: DataFrame,
    dim: int = 16,
    decode_stub: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """binary payload -> fixed-width feature vector (Arrow-batched).

    Narrow map over the media scan; payloads never leave the executor
    except as ``dim`` doubles — the 100 TB-friendly shape (decode where
    the bytes are, ship features only).

    ``on_error="skip"`` is the reference's load-failure recovery
    (design.md:2374: skip, record, continue): a corrupt payload yields a
    row with null features and the error message in an ``error`` column
    instead of killing the job — at 100 TB some payloads WILL be bad.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    skip = on_error == "skip"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes, errs = [], [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                b = bytes(payload)
                try:
                    arr = (
                        _decode_fake(b, modality, dim)
                        if decode_stub
                        else _signal_features(_decode_real(b, modality), dim)
                    )
                    err = None
                except Exception as e:  # noqa: BLE001 — per-row recovery
                    if not skip:
                        raise
                    arr, err = None, f"{type(e).__name__}: {e}"
                feats.append(arr)
                nbytes.append(len(b))
                errs.append(err)
            if len(pdf):
                out = {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                    "n_bytes": nbytes,
                }
                if skip:
                    out["error"] = errs
                yield pd.DataFrame(out)

    schema = FEATURE_ERR_SCHEMA if skip else FEATURE_SCHEMA
    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=schema
    )


def sample_video_frames(
    media: DataFrame, every_n: int = 2, decode_stub: bool = True
) -> DataFrame:
    """Frame-sampling plumbing (video analog of the frame/hop grid):
    emit every ``every_n``-th frame.

    ``decode_stub=False`` extracts REAL frames: for an MJPEG AVI the
    movi walk yields each sampled frame's actual JPEG payload (decoded
    downstream by multimodal/jpeg.py).  Stub mode splits the payload
    into ``meta.n_frames`` equal byte slices — plumbing-only fixtures.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                b = bytes(payload)
                if not decode_stub:
                    from audio_feature_extraction_spark.multimodal.avi import (
                        iter_video_frames,
                    )

                    for fi, (_s, frame) in enumerate(iter_video_frames(b)):
                        if fi % every_n == 0:
                            rows.append((mid, fi, frame))
                    continue
                n = int(meta["n_frames"] or 1)
                step = max(len(b) // max(n, 1), 1)
                for fi in range(0, n, every_n):
                    rows.append((mid, fi, b[fi * step : (fi + 1) * step]))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "frame_idx", "frame_payload"]
                )

    return media.where(F.col("modality") == "video").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


def synthetic_media(spark, n: int = 8) -> DataFrame:
    """Deterministic fixture: payload bytes derived from the id."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media_{i}".encode()).digest() * (i % 4 + 1)
        meta = {
            "width": 64 if modality == "image" else None,
            "height": 64 if modality == "image" else None,
            "sample_rate": 16000 if modality == "audio" else None,
            "n_frames": 6 if modality == "video" else None,
            "codec": "fake",
        }
        rows.append((f"media_{i}", modality, payload, meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
