"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The decode step is STUBBED (no image/audio libraries in this
environment): ``FakeDecoder`` produces deterministic per-payload
features so the Ray-side plumbing — schema, small-batch actor pool,
output layout — is real and tested; swap ``decode_stub`` for a real
PIL/ffmpeg call in production (it would raise NotImplementedError here).

Large binary payloads need small batch sizes so batch x concurrency
fits worker heaps — ``decode_features`` defaults to batch_size=64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..hashing import splitmix64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Placeholder for a real decoder (PIL / libav). Raises by contract."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use FakeDecoder for plumbing tests"
    )


class FakeDecoder:
    """Actor-pool decode stage with a deterministic fake: 8 'features'
    derived from the payload bytes (stands in for a thumbnail embed /
    mel spectrogram). Setup (the 'model load') happens once per actor."""

    DIM = 8

    def __init__(self):
        self.coeff = splitmix64(np.arange(self.DIM, dtype=np.uint64) + np.uint64(99))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.empty((len(payloads), self.DIM), np.float64)
        for i, p in enumerate(payloads):
            a = np.frombuffer(p, dtype=np.uint8).astype(np.uint64)
            if len(a) == 0:
                feats[i] = 0.0
                continue
            mixed = splitmix64(a[:256, None] * self.coeff[None, :])
            feats[i] = (mixed.mean(axis=0).astype(np.float64)) / 2**64
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


def decode_features(
    media: Dataset, concurrency: int = 4, batch_size: int = 64
) -> Dataset:
    """media(media_id, kind, payload, ...) -> (media_id, kind, features).

    Small batches + actor pool: the layout a real decoder would use."""
    return media.map_batches(
        FakeDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_dataset(n: int = 64) -> Dataset:
    """Deterministic fake media table exercising MEDIA_SCHEMA."""
    import ray.data

    kinds = ["image", "audio", "video"]

    def gen(b) -> pa.Table:
        ids = b["id"].astype(np.int64)
        payloads = [
            splitmix64(np.arange(64, dtype=np.uint64) + np.uint64(i)).tobytes()
            for i in ids
        ]
        return pa.table(
            {
                "media_id": pa.array(ids),
                "kind": pa.array([kinds[i % 3] for i in ids], pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([64] * len(ids), pa.int32()),
                "height": pa.array([64] * len(ids), pa.int32()),
                "duration_ms": pa.array([0] * len(ids), pa.int32()),
            }
        )

    return ray.data.range(n).map_batches(gen, batch_format="numpy")
