"""Multimodal columns — opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as `binary` columns plus metadata
(mime, width/height, sample rate …). Decode / feature-extraction libraries are
NOT available in this container, so the decode kernel is a clearly-marked stub
(deterministic fake features keyed on the payload hash) — the Ray-side
plumbing (schema, small batches for large payloads, actor-pool signature,
output layout) is real and tested.

Scale notes: binary payloads dominate block size — use small `batch_size` and
consider a larger `target_max_block_size` so blocks aren't split absurdly
small (ray_guide pitfalls); decode stages are actor pools because real
decoders amortize codec/model init per actor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MULTIMODAL_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("mime", pa.string()),
    ("payload", pa.large_binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def make_fake_items(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake multimodal rows (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(s), dtype=np.uint8).tobytes()
                for s in rng.integers(512, 4096, size=n)]
    return pa.table({
        "item_id": pa.array(np.arange(n, dtype=np.int64)),
        "mime": pa.array(["image/png" if i % 2 == 0 else "audio/wav" for i in range(n)]),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
    })


def decode_image(payload: bytes) -> np.ndarray:
    """REAL decode would go here (PIL/libvips). Not available in this
    container — see the stubbed feature path in FeatureExtractStage."""
    raise NotImplementedError(
        "image decode requires PIL/libvips which are not installed; "
        "FeatureExtractStage uses the deterministic stub features instead")


class FeatureExtractStage:
    """Actor-pool decode/feature stage. __init__ = model/codec load (stubbed);
    __call__ = per-batch feature extraction (deterministic fake: 8 moments of
    the payload bytes — stands in for an image/audio embedding)."""

    FEAT_DIM = 8

    def __init__(self) -> None:
        self.ready = True  # real impl: load codec + model weights here

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.zeros((batch.num_rows, self.FEAT_DIM), dtype=np.float32)
        for i, buf in enumerate(batch["payload"].to_pandas()):
            b = np.frombuffer(buf, dtype=np.uint8).astype(np.float32)
            chunks = np.array_split(b, self.FEAT_DIM)
            feats[i] = [c.mean() if len(c) else 0.0 for c in chunks]
        return batch.drop_columns(["payload"]).append_column(
            "features", pa.array(list(feats), type=pa.list_(pa.float32())))
