"""comp_original comparison figure config (parity: reference
`source/figures/comp_original.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['abc', 'famous_original', 'thingi10k_scans_original']
METHODS = None

if __name__ == "__main__":
    run_comparison("comp_original", DATASETS, methods=METHODS)
