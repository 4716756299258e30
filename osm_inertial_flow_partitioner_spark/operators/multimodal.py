"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata. The decode step is STUBBED (no codec libraries in this
runtime) behind a deterministic fake, clearly marked; the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
tested, so swapping in a real decoder (PIL/torchaudio/ffmpeg) is a
one-function change.

Patterns:
- ``mapInPandas`` for decode/feature-extract (Arrow batches of binary);
- fixed-size feature vectors as array<float> feeding similarity.py;
- frame sampling returns one row per sampled frame (explode-style
  iterator output).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)
FEATURE_DIM = 16

# capability flag: a REAL image decoder is used when PIL is importable
# AND the caller opts in (real_decode=True). In codec-less runtimes the
# deterministic stub keeps the full Spark plumbing testable; the DuckDB
# oracle row always runs the stub path (the oracle can't decode images).
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # this container has no PIL
    _PILImage = None
    HAS_PIL = False


def _fake_decode(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE standing in for a real image/audio decoder —
    derives a pseudo-pixel array from the payload bytes. The real path
    (``decode_image(..., real=True)``) goes through PIL when present."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        arr = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(256 / len(arr)))
    return np.tile(arr, reps)[:256].astype(np.float32).reshape(16, 16)


def _pil_decode(payload: bytes) -> np.ndarray:
    """Real decoder: grayscale 16x16 via PIL — same output contract as
    the stub (float32 (16, 16)), so every downstream operator is
    identical on both paths."""
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((16, 16))
    return np.asarray(img, dtype=np.float32)


def decode_image(payload: bytes, real: bool = False) -> np.ndarray:
    """Single decode chokepoint. ``real=True`` requires PIL; raises
    NotImplementedError (loudly, not silently wrong) if absent."""
    if real:
        if not HAS_PIL:
            raise NotImplementedError(
                "real image decode requested but PIL is not installed; "
                "install pillow or use the deterministic stub (real=False)"
            )
        return _pil_decode(payload)
    return _fake_decode(payload)


def _wav_decode(payload: bytes) -> np.ndarray:
    """Real audio decoder: stdlib ``wave`` (PCM WAV), no external codec
    needed. Mono-mixes, then samples 256 evenly spaced amplitudes
    (zero-padded) into the SAME float32 (16, 16) output contract as the
    image path, so every downstream operator (feature pooling,
    similarity) is identical across modalities."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float32)
    elif width == 1:  # 8-bit WAV is unsigned
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0
    else:
        raise NotImplementedError(
            f"unsupported WAV sample width {width} (PCM 8/16-bit only)"
        )
    if n_ch > 1:
        samples = samples[: len(samples) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    out = np.zeros(256, dtype=np.float32)
    if len(samples):
        idx = np.linspace(0, len(samples) - 1, 256).astype(np.int64)
        out[:] = samples[idx]
    return out.reshape(16, 16)


def decode_audio(payload: bytes, real: bool = False) -> np.ndarray:
    """Audio chokepoint, same pattern as ``decode_image``. ``real=True``
    parses PCM WAV via the stdlib ``wave`` module; compressed containers
    (mp3/ogg/aac — no codec in this runtime) raise NotImplementedError
    loudly rather than decode wrongly."""
    if real:
        import wave

        try:
            return _wav_decode(payload)
        except wave.Error as e:
            raise NotImplementedError(
                f"real audio decode supports PCM WAV only in this runtime "
                f"(stdlib wave): {e}"
            ) from e
    return _fake_decode(payload)


def _y4m_decode(payload: bytes, max_frames: int = 8) -> np.ndarray:
    """Real video decoder for the uncompressed YUV4MPEG2 (.y4m)
    container — plain-text stream header (``YUV4MPEG2 W<w> H<h> ...``)
    followed by ``FRAME``-delimited raw planar YCbCr frames, parseable
    with the stdlib alone (it is what ``ffmpeg -f yuv4mpegpipe`` emits).
    Samples up to ``max_frames`` evenly spaced frames, block-averages
    each frame's luma plane to 16x16 (pure numpy — no PIL needed), and
    mean-pools across the sampled frames into the SAME float32 (16, 16)
    contract as the image/audio paths, so downstream feature pooling
    and similarity are identical across modalities.

    Supports C420 (any 420 variant), C422 and C444 chroma subsampling —
    only the luma plane is read, but the chroma layout fixes the frame
    stride. Anything that is not a y4m stream raises (see
    ``decode_video``)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream (missing magic)")
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "replace").split(" ")
    w = h = None
    chroma = "420"
    for p in header[1:]:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("C"):
            chroma = p[1:]
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    luma = w * h
    if chroma.startswith("420"):
        frame_bytes = luma + 2 * ((w // 2) * (h // 2))
    elif chroma.startswith("422"):
        frame_bytes = luma + 2 * ((w // 2) * h)
    elif chroma.startswith("444"):
        frame_bytes = 3 * luma
    elif chroma.startswith("mono"):
        frame_bytes = luma
    else:
        raise ValueError(f"unsupported y4m chroma sampling C{chroma}")
    # frames: b"FRAME"[params]"\n" + planar data
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"corrupt y4m: expected FRAME marker at byte {pos}")
        fnl = payload.index(b"\n", pos)
        start = fnl + 1
        end = start + frame_bytes
        if end > len(payload):
            raise ValueError("corrupt y4m: truncated frame payload")
        frames.append(payload[start : start + luma])  # luma plane only
        pos = end
    if not frames:
        raise ValueError("y4m stream contains no frames")
    take = np.linspace(0, len(frames) - 1, min(max_frames, len(frames))).astype(int)
    acc = np.zeros((16, 16), dtype=np.float64)
    for fi in take:
        y = np.frombuffer(frames[fi], dtype=np.uint8).astype(np.float64).reshape(h, w)
        # block-average to 16x16: pad to a multiple of 16 by edge-clamp
        ri = np.minimum((np.arange(16)[:, None] * h) // 16, h - 1)
        ci = np.minimum((np.arange(16)[None, :] * w) // 16, w - 1)
        rj = np.minimum(((np.arange(16)[:, None] + 1) * h + 15) // 16, h)
        cj = np.minimum(((np.arange(16)[None, :] + 1) * w + 15) // 16, w)
        cs = np.zeros((h + 1, w + 1), dtype=np.float64)
        cs[1:, 1:] = y.cumsum(0).cumsum(1)
        area = (rj - ri) * (cj - ci)
        acc += (
            cs[rj, cj] - cs[ri, cj] - cs[rj, ci] + cs[ri, ci]
        ) / np.maximum(area, 1)
    return (acc / len(take)).astype(np.float32)


def decode_video(payload: bytes, real: bool = False) -> np.ndarray:
    """Video chokepoint, same pattern as ``decode_image``/``decode_audio``.
    ``real=True`` decodes the uncompressed YUV4MPEG2 container with the
    stdlib+numpy parser above; compressed codecs (h264/vp9/av1 — no
    codec library in this runtime) raise NotImplementedError loudly
    rather than decode wrongly."""
    if real:
        try:
            return _y4m_decode(payload)
        except ValueError as e:
            raise NotImplementedError(
                f"real video decode supports uncompressed YUV4MPEG2 (.y4m) "
                f"only in this runtime (no h264/vp9/av1 codec library): {e}"
            ) from e
    return _fake_decode(payload)


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """binary payload -> fixed-dim feature vector (mean-pooled rows of
    the decoded array). Real plumbing: Arrow-batched mapInPandas,
    array<float> output column; ``real_decode`` flips the chokepoint to
    the real decoders per modality — PIL for ``kind='image'``
    (capability-gated), stdlib-wave PCM for ``kind='audio'``,
    stdlib+numpy YUV4MPEG2 for ``kind='video'`` (compressed codecs
    raise NotImplementedError loudly — no codec library in this
    runtime)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p, kind in zip(pdf["payload"], pdf["kind"]):
                if real_decode and kind == "audio":
                    arr = decode_audio(p, real=True)
                elif real_decode and kind == "video":
                    arr = decode_video(p, real=True)
                else:
                    arr = decode_image(p, real_decode)
                feats.append(arr.mean(axis=1)[:FEATURE_DIM].tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.mapInPandas(fn, schema="media_id long, features array<float>")


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes metadata through, recomputes the payload
    via the fake decoder (marker for the real cv2/PIL resize)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            out["payload"] = [
                _fake_decode(p)[:1].tobytes() for p in pdf["payload"]
            ]
            yield out[["media_id", "kind", "payload", "width", "height", "duration_ms"]]

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame index
    (duration_ms // every_ms frames, >= 1). Real decode would slice the
    container; the fake emits frame indices + per-frame checksum."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_crc": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = max(int(dur or 0) // every_ms, 1)
                base = _fake_decode(payload).sum()
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_crc"].append(float(base) + i)
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, schema="media_id long, frame_idx int, frame_crc double")
