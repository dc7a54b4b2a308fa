"""comp_dense comparison figure config (parity: reference
`source/figures/comp_dense.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['famous_dense', 'thingi10k_scans_dense']
METHODS = None

if __name__ == "__main__":
    run_comparison("comp_dense", DATASETS, methods=METHODS)
