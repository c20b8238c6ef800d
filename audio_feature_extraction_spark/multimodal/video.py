"""Real VIDEO frame decode — MJPEG-in-AVI profile.

Motion-JPEG is the composable case: the AVI RIFF container
(multimodal/avi.py walks it; ``iter_video_frames`` yields the 'NNdc'
chunks) carries one baseline JPEG per frame (multimodal/jpeg.py
decodes it).  That makes video decode REAL for the MJPEG profile —
frame sampling, per-frame luminance, and motion statistics all run on
actual pixel data — while inter-coded codecs (H.264/VP9/AV1) keep the
documented ffmpeg-class seam.
"""

from __future__ import annotations

import numpy as np

from audio_feature_extraction_spark.core.errors import LoadError
from audio_feature_extraction_spark.multimodal.avi import (
    AviError,
    iter_video_frames,
    parse_avi,
)
from audio_feature_extraction_spark.multimodal.jpeg import decode_jpeg


def decode_mjpeg_frames(
    payload: bytes, every_n: int = 1, max_frames: int | None = None
) -> list[np.ndarray]:
    """AVI payload -> list of (H, W) float64 luminance frames in [0, 1]
    (every ``every_n``-th frame, at most ``max_frames``).

    Raises LoadError when the video stream is not MJPEG (the seam for
    inter-coded codecs) or the payload is not an AVI.
    """
    info = parse_avi(payload)
    vcodec = info.video_codec
    if vcodec is None:
        raise LoadError("AVI has no video stream")
    if vcodec.upper() not in ("MJPG", "MJPEG"):
        raise LoadError(
            f"video codec {vcodec!r} needs an ffmpeg-class decoder; "
            f"MJPEG decodes here (container metadata IS parsed)"
        )
    frames: list[np.ndarray] = []
    for i, (_stream, raw) in enumerate(iter_video_frames(payload)):
        if i % every_n:
            continue
        rgb = decode_jpeg(raw)
        frames.append(rgb.astype(np.float64).mean(axis=2) / 255.0)
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise LoadError("no decodable MJPEG frames found")
    return frames


def video_motion_signal(payload: bytes, every_n: int = 1) -> np.ndarray:
    """1-D per-frame signal from real pixels: mean absolute luminance
    change between consecutive sampled frames (frame 0 contributes its
    mean luminance) — the video analog of the audio feature input."""
    frames = decode_mjpeg_frames(payload, every_n=every_n)
    out = np.empty(len(frames))
    out[0] = frames[0].mean()
    for i in range(1, len(frames)):
        out[i] = np.abs(frames[i] - frames[i - 1]).mean()
    return out
