"""comp_ablation_original comparison figure config (parity: reference
`source/figures/comp_ablation_original.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['famous_original', 'thingi10k_scans_original']
METHODS = ['ppsurf_25nn', 'ppsurf_50nn', 'ppsurf_vanilla', 'ppsurf_merge_sum']

if __name__ == "__main__":
    run_comparison("comp_ablation_original", DATASETS, methods=METHODS)
