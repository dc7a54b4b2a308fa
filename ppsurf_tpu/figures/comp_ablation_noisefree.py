"""comp_ablation_noisefree comparison figure config (parity: reference
`source/figures/comp_ablation_noisefree.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['abc_noisefree', 'famous_noisefree', 'thingi10k_scans_noisefree']
METHODS = ['ppsurf_25nn', 'ppsurf_50nn', 'ppsurf_vanilla', 'ppsurf_merge_sum']

if __name__ == "__main__":
    run_comparison("comp_ablation_noisefree", DATASETS, methods=METHODS)
