"""comp_sparse comparison figure config (parity: reference
`source/figures/comp_sparse.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['famous_sparse', 'thingi10k_scans_sparse']
METHODS = None

if __name__ == "__main__":
    run_comparison("comp_sparse", DATASETS, methods=METHODS)
