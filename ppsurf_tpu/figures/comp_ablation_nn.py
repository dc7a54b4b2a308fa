"""comp_ablation_nn comparison figure config (parity: reference
`source/figures/comp_ablation_nn.py`)."""
from ppsurf_tpu.figures.comp_base import run_comparison

DATASETS = ['abc']
METHODS = ['ppsurf_10nn', 'ppsurf_25nn', 'ppsurf_50nn', 'ppsurf_100nn', 'ppsurf_200nn']

if __name__ == "__main__":
    run_comparison("comp_ablation_nn", DATASETS, methods=METHODS)
