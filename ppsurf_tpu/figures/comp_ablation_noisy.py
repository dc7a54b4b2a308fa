"""comp_ablation_noisy comparison figure config (parity: reference
`source/figures/comp_ablation_noisy.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['abc_extra_noisy', 'famous_extra_noisy', 'thingi10k_scans_extra_noisy']
METHODS = ['ppsurf_25nn', 'ppsurf_50nn', 'ppsurf_vanilla', 'ppsurf_merge_sum']

if __name__ == "__main__":
    run_comparison("comp_ablation_noisy", DATASETS, methods=METHODS)
