"""Mini end-to-end run for the POCO baseline (parity: reference
`full_run_poco_mini.py`)."""
import sys

from ppsurf_tpu.cli import main


def run(extra=()):
    base = ["-c", "configs/poco.yaml", "-c", "configs/poco_mini.yaml"]
    args = list(extra)
    for sub in ("fit", "test", "predict"):
        print(f"=== {sub} ===")
        main([sub] + base + args)


if __name__ == "__main__":
    run(sys.argv[1:])
