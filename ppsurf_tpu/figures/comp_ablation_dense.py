"""comp_ablation_dense comparison figure config (parity: reference
`source/figures/comp_ablation_dense.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['famous_dense', 'thingi10k_scans_dense']
METHODS = ['ppsurf_25nn', 'ppsurf_50nn', 'ppsurf_vanilla', 'ppsurf_merge_sum']

if __name__ == "__main__":
    run_comparison("comp_ablation_dense", DATASETS, methods=METHODS)
