"""comp_noisefree comparison figure config (parity: reference
`source/figures/comp_noisefree.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['abc_noisefree', 'famous_noisefree', 'thingi10k_scans_noisefree']
METHODS = None

if __name__ == "__main__":
    run_comparison("comp_noisefree", DATASETS, methods=METHODS)
