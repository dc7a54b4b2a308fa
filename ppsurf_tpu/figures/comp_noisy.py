"""comp_noisy comparison figure config (parity: reference
`source/figures/comp_noisy.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['abc_extra_noisy', 'famous_extra_noisy', 'thingi10k_scans_extra_noisy']
METHODS = None

if __name__ == "__main__":
    run_comparison("comp_noisy", DATASETS, methods=METHODS)
