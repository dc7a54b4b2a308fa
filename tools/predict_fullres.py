"""Full-resolution trained evidence: predict abc_minimal at res 257 with
the ppsurf_mini checkpoint, then recompute CD/F1/IoU/NC (VERDICT r2 #6 —
the production-resolution path with real weights producing real metrics).

Writes results under results/ppsurf_mini_res257/abc_minimal and prints the
metric means + s/object. TPU: ~2-4 min/shape + compile warmup.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from ppsurf_tpu.cli import main as cli_main
    from ppsurf_tpu.eval.make_evaluation import evaluate_method_on_dataset

    # trained mini checkpoint: the live orbax run dir when present, else
    # the committed inference-only npz snapshot (models/ is gitignored and
    # wiped between rounds; see tools/export_infer_ckpt.py)
    ckpt = "models/ppsurf_mini/version_0/checkpoints/last"
    if not os.path.isdir(ckpt):
        ckpt = "models_pretrained/ppsurf_mini_infer.npz"
    base = [
        "-c", "configs/poco.yaml",
        "-c", "configs/ppsurf.yaml",
        "-c", "configs/ppsurf_mini.yaml",
        # production resolution + chunk (overrides the mini halves); fresh
        # name so the res-129 campaign results stay untouched
        "--model.init_args.gen_resolution_global", "257",
        "--model.init_args.rec_batch_size", "50000",
        "--model.init_args.name", "ppsurf_mini_res257",
        "--ckpt_path", ckpt,
    ]
    t0 = time.time()
    cli_main(["predict"] + base + sys.argv[1:])
    dt = time.time() - t0
    res = evaluate_method_on_dataset(
        "ppsurf_mini_res257", "abc_minimal", workers=2, force=True
    )
    print(f"predict wall: {dt:.1f}s total")
    if res:
        for k, v in res.items():
            try:
                print(f"{k}: {v}")
            except Exception:
                pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
