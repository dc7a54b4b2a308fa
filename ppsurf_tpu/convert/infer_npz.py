"""Inference-only checkpoint snapshots as compressed npz.

The orbax TrainState layout (`train/loop.py`) is the source of truth for
training/resume; this is a compact interchange format for shipping trained
weights inside the repo (models/ is gitignored; a full TrainState is ~3x
the params). Large f32 kernels are stored as f16 — inference computes in
bfloat16 (coarser than f16), so the round trip is lossless for the compute
path. See tools/export_infer_ckpt.py for the writer.
"""
from __future__ import annotations

import numpy as np


def load_infer_npz(path: str) -> dict:
    """npz with 'params/...'/'batch_stats/...' keys -> nested variables."""
    out: dict = {"params": {}, "batch_stats": {}}
    with np.load(path) as z:
        for key in z.files:
            parts = key.split("/")
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            arr = z[key]
            if arr.dtype == np.float16:
                arr = arr.astype(np.float32)
            node[parts[-1]] = arr
    return out
