"""Multimodal columns: binary payloads + typed metadata.

Media are opaque ``binary`` columns with a metadata struct; the Spark
plumbing (schema, Arrow batch shape, partition sizing) is real and
tested; the codec step itself is STUBBED — the decode libraries
(Pillow/ffmpeg/librosa) are not in this container. ``decode_mode``:

- "strict": raise NotImplementedError at the decode step (production
  placeholder, makes the missing codec explicit);
- "fake":   deterministic fake decode (seeded from the payload sha) so
  downstream feature plumbing is exercised end-to-end in tests.

Real, non-stubbed operators: byte histogram + entropy features
(pure numpy over Arrow batches) and payload sharding/batching.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, entropy double, "
    "byte_hist array<int>"
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, "
    "pixels array<float>"
)


def byte_features(media: DataFrame) -> DataFrame:
    """Codec-free features: size, shannon entropy, 16-bucket byte
    histogram. Vectorized numpy inside mapInPandas (Arrow binary in)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                hist = np.bincount(buf >> 4, minlength=16).astype(np.int64)
                p = hist / max(1, buf.size)
                ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": int(buf.size),
                        "entropy": round(ent, 6),
                        "byte_hist": hist.tolist(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "entropy", "byte_hist"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image codec: pixels derived from the
    payload sha256 (stable across executors/runs)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random(width * height, dtype=np.float32)


def decode_images(
    media: DataFrame, target: tuple[int, int] = (8, 8), decode_mode: str = "strict"
) -> DataFrame:
    """Decode + resize stub. ``strict`` raises at the decode step (no
    codec libs in this container); ``fake`` produces deterministic
    pixels so the downstream schema/batching is fully exercised."""
    w, h = target

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                if decode_mode == "strict":
                    raise NotImplementedError(
                        "image codec not available in this environment; "
                        "use decode_mode='fake' or install a codec"
                    )
                pixels = _fake_decode(bytes(r.payload), w, h)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "width": w,
                        "height": h,
                        "pixels": [float(x) for x in pixels],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "pixels"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def frame_sample_plan(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling indices (video stub helper)."""
    if n_frames <= 0 or every <= 0:
        return []
    return list(range(0, n_frames, every))


def entropy_of(hist: list[int]) -> float:
    total = sum(hist)
    if total == 0:
        return 0.0
    return -sum((c / total) * math.log2(c / total) for c in hist if c)
