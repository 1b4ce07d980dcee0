"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode step is STUBBED: the image/audio libraries are not in this
container, so ``decode`` raises ``NotImplementedError`` unless the
deterministic fake decoder is selected. Everything around the stub —
schema, batch sizing, actor signature, output layout — is real and
tested, so swapping in a real decoder (PIL / torchaudio / ffmpeg in
``_decode_real``) changes nothing else.

Design notes for 100 TB: payload rows are heavy, so the stages use
small ``batch_size`` and actor pools sized by ``concurrency``; outputs
drop the payload column immediately (select_columns) the same way the
flagship drops ``html`` after text extraction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def _decode_real(payload: bytes, media_type: str) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg/torchaudio, which are not "
        "in this container; use fake=True (deterministic surrogate) or plug "
        "a decoder in here"
    )


def _decode_fake(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic surrogate decoder: a 16-dim float32 'feature' from
    the payload digest — stable across processes, good enough to test
    the plumbing and downstream similarity ops."""
    h = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    v = np.frombuffer(h, dtype=np.uint32).astype(np.float32)
    return (v % 1000) / 1000.0


class MediaFeatureStage:
    """Actor-pool stage: (media_id, payload) -> (media_id, feature
    list<float>). Instantiate with ``concurrency=N, batch_size=small``
    — payloads are heavy, so a batch × pool must fit worker heap."""

    def __init__(self, fake: bool = True):
        self.decode = _decode_fake if fake else _decode_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.decode(bytes(p), t)
            for p, t in zip(
                batch["payload"].to_pylist(), batch["media_type"].to_pylist()
            )
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


class FrameSampleStage:
    """Video frame-sampling stub: emits (media_id, frame_idx, frame
    payload slice) rows — 1->N flat-map shape with deterministic fake
    frames (payload byte slices)."""

    def __init__(self, every_ms: int = 1000, fake: bool = True):
        self.every_ms = every_ms
        if not fake:
            raise NotImplementedError("real frame sampling needs ffmpeg")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            n = max(1, int(dur or 0) // self.every_ms)
            payload = bytes(payload)
            step = max(1, len(payload) // n)
            for i in range(n):
                ids.append(mid)
                idxs.append(i)
                frames.append(payload[i * step : (i + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def media_features(ds: Dataset, fake: bool = True, concurrency=(1, 4)) -> Dataset:
    """The media feature-extraction pipeline stage (actor pool — the
    real decoder is expensive per-actor state)."""
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=64,            # heavy payload rows -> small batches
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(ds: Dataset, every_ms: int = 1000, concurrency=(1, 4)) -> Dataset:
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"every_ms": every_ms, "fake": True},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic synthetic media table in MEDIA_SCHEMA (for tests)."""
    rng = np.random.RandomState(seed)
    types = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "media_type": [types[i % 3] for i in range(n)],
        "payload": [rng.bytes(256 + (i % 5) * 64) for i in range(n)],
        "width": [640 if i % 3 == 0 else 0 for i in range(n)],
        "height": [480 if i % 3 == 0 else 0 for i in range(n)],
        "duration_ms": [0 if i % 3 == 0 else 3000 + 500 * (i % 4) for i in range(n)],
    }
    return pa.table(
        {k: pa.array(v, MEDIA_SCHEMA.field(k).type) for k, v in rows.items()}
    )
