"""comp_ablation_sparse comparison figure config (parity: reference
`source/figures/comp_ablation_sparse.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['famous_sparse', 'thingi10k_scans_sparse']
METHODS = ['ppsurf_25nn', 'ppsurf_50nn', 'ppsurf_vanilla', 'ppsurf_merge_sum']

if __name__ == "__main__":
    run_comparison("comp_ablation_sparse", DATASETS, methods=METHODS)
