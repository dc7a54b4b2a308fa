"""Export an inference-only snapshot of a trained orbax checkpoint.

The full orbax TrainState (params + adam moments, f32) is ~146 MB for
ppsurf_mini — too heavy to commit, so trained weights were lost between
rounds (models/ is gitignored). This writes a compressed npz holding just
{params, batch_stats} with large kernels in float16: inference runs in
bfloat16 (coarser than f16), so the storage precision is lossless for the
compute path. ~20 MB, committed under models_pretrained/.

Usage:
    python tools/export_infer_ckpt.py \
        models/ppsurf_mini/version_0/checkpoints/last \
        models_pretrained/ppsurf_mini_infer.npz

Load back with `ppsurf_tpu.convert.infer_npz.load_infer_npz`.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ppsurf_tpu.cli import load_checkpoint_variables

    src, dst = sys.argv[1], sys.argv[2]
    variables = load_checkpoint_variables(src)
    flat = {}
    for top in ("params", "batch_stats"):
        if top not in variables:
            continue
        leaves = jax.tree_util.tree_flatten_with_path(variables[top])[0]
        for path, leaf in leaves:
            key = top + "/" + "/".join(
                getattr(p, "key", str(getattr(p, "idx", p))) for p in path
            )
            arr = np.asarray(leaf)
            if arr.dtype == np.float32 and arr.size > 4096:
                arr = arr.astype(np.float16)
            flat[key] = arr
    np.savez_compressed(dst, **flat)
    print(f"{dst}: {len(flat)} arrays, "
          f"{os.path.getsize(dst) / 1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
