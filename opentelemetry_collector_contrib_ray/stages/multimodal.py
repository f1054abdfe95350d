"""Multimodal columns: opaque binary payloads + typed metadata.

Engine additions for training-data pipelines. Images/audio/video ride
as ``binary`` columns; decode / resize / feature-extraction are
actor-pool map_batches stages sized for large rows (small batch_size,
list/binary kept in Arrow end-to-end).

The sandbox has no image/audio libraries, so the DECODE KERNELS ARE
STUBBED: ``DeterministicFakeDecoder`` produces seeded, shape-correct
fake outputs so the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested; ``PillowImageDecoder``
raises NotImplementedError unless PIL is importable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._util import hash_u64


IMAGE_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_image_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake image rows (payload = seeded bytes)."""
    ids = np.arange(n, dtype=np.uint64) + np.uint64(seed)
    sizes = (64 + hash_u64(ids, 40) % 192).astype(np.int32)
    payloads = [
        bytes(
            (hash_u64(np.arange(int(s), dtype=np.uint64), int(i)) % 256).astype(np.uint8)
        )
        for i, s in zip(ids, sizes)
    ]
    return pa.table(
        {
            "item_id": pa.array([f"img-{int(i):06d}" for i in ids]),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * n),
            "width": pa.array(sizes),
            "height": pa.array(sizes),
        }
    )


class PillowImageDecoder:
    """Real decoder stage shape; requires PIL (absent in this sandbox).

    Use: ds.map_batches(PillowImageDecoder, concurrency=N,
    batch_size=64, num_cpus=1) — small batches because payload bytes
    dominate block size.
    """

    def __init__(self, target_size: tuple[int, int] = (224, 224)):
        try:
            from PIL import Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False
        self.target_size = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._pil:
            raise NotImplementedError(
                "PIL not available in this environment; use DeterministicFakeDecoder "
                "for plumbing tests or install pillow in production"
            )
        raise NotImplementedError("real decode path exercised only where PIL exists")


class DeterministicFakeDecoder:
    """Stub decode/feature-extract: payload bytes → seeded fixed-length
    float32 'embedding' + basic stats. Deterministic in payload content
    so tests can assert exact values. Same actor signature / output
    layout as a real decoder."""

    def __init__(self, feature_dim: int = 16):
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        means = np.zeros(len(batch), dtype=np.float64)
        for i, payload in enumerate(batch["payload"].to_pylist()):
            arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
            means[i] = float(arr.mean())
            h = hash_u64(np.arange(self.dim, dtype=np.uint64), int(arr.sum()) % (1 << 31))
            feats.append(((h % 1000).astype(np.float32) / 1000.0))
        flat = pa.array(np.concatenate(feats))
        offs = pa.array(np.arange(0, (len(batch) + 1) * self.dim, self.dim, dtype=np.int32))
        out = batch.append_column("features", pa.ListArray.from_arrays(offs, flat))
        return out.append_column("byte_mean", pa.array(means))


def frame_sample(batch: pa.Table, every_n: int = 10) -> pa.Table:
    """Video frame-sampling stand-in: keep every Nth row of a
    frames-as-rows table (plumbing for a real frame extractor)."""
    idx = np.arange(0, len(batch), every_n)
    return batch.take(pa.array(idx))
