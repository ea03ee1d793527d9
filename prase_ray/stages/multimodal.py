"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata.  The Ray-side plumbing — schemas, actor
signatures, batch sizing, output layout — is real and tested; the
actual codec calls are STUBBED (image/audio libraries are not in this
container): ``mode='strict'`` raises NotImplementedError at the decode
call site, ``mode='fake'`` substitutes a deterministic fake decoder so
the pipeline shape is exercisable end-to-end.

Batch-size guidance: binary payloads are large — size ``batch_size``
so batch_bytes × concurrency stays under the worker heap (the caller
passes rows-per-batch; at 1 MiB media blobs keep it ≤ 64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


class ImageDecoder:
    """binary → (height, width, channels, feature vector).  Real
    implementation would hold a decoder/model per actor (``num_gpus``
    for GPU decode)."""

    def __init__(self, mode: str = "strict", feature_dim: int = 8):
        assert mode in ("strict", "fake")
        self.mode = mode
        self.feature_dim = feature_dim

    def _decode(self, blob: bytes) -> tuple[int, int, int, np.ndarray]:
        if self.mode == "strict":
            raise NotImplementedError(
                "image decode requires PIL/cv2 — not available in this "
                "environment; run with mode='fake' for pipeline tests"
            )
        # deterministic fake: dimensions and features derived from bytes
        h = 1 + blob[0] if blob else 1
        w = 1 + (blob[1] if len(blob) > 1 else 0)
        rng = np.random.default_rng(len(blob))
        feat = rng.normal(size=self.feature_dim)
        return h, w, 3, feat

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hs, ws, cs, feats = [], [], [], []
        for blob in batch["data"]:
            h, w, c, f = self._decode(bytes(blob))
            hs.append(h)
            ws.append(w)
            cs.append(c)
            feats.append(f.astype(np.float32))
        return pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "height": np.array(hs, np.int32),
                "width": np.array(ws, np.int32),
                "channels": np.array(cs, np.int32),
                "feature": feats,
            }
        )


class FrameSampler:
    """video binary → K sampled frame descriptors (flat_map-shaped:
    one row in, K rows out)."""

    def __init__(self, mode: str = "strict", k: int = 4):
        assert mode in ("strict", "fake")
        self.mode = mode
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.mode == "strict":
            raise NotImplementedError(
                "video decode unavailable — use mode='fake'"
            )
        ids = np.repeat(batch["media_id"].to_numpy(), self.k)
        frame_idx = np.tile(np.arange(self.k, dtype=np.int32), len(batch))
        sizes = np.repeat(
            batch["data"].map(len).to_numpy(np.int64), self.k
        )
        return pd.DataFrame(
            {
                "media_id": ids,
                "frame_idx": frame_idx,
                "frame_hash": (sizes * 2654435761 + frame_idx) % (1 << 31),
            }
        )


def decode_images(
    media: ray.data.Dataset,
    *,
    mode: str = "strict",
    concurrency: int = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    return media.map_batches(
        ImageDecoder,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"mode": mode},
    )


def sample_frames(
    media: ray.data.Dataset,
    *,
    mode: str = "strict",
    k: int = 4,
    concurrency: int = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    return media.map_batches(
        FrameSampler,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"mode": mode, "k": k},
    )


def synth_media(n: int = 64, seed: int = 42) -> ray.data.Dataset:
    """Deterministic fake media table (media_id, kind, data:binary)."""
    rng = np.random.default_rng(seed)
    rows = [
        {
            "media_id": i,
            "kind": "image" if i % 2 == 0 else "video",
            "data": bytes(rng.integers(0, 256, size=int(rng.integers(8, 64))).tolist()),
        }
        for i in range(n)
    ]
    return ray.data.from_items(rows)
