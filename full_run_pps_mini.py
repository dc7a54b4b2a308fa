"""Mini end-to-end run: fit -> test -> predict on the bundled abc_minimal.

Parity: reference `full_run_pps_mini.py` — the de-facto integration test
(SURVEY.md §4). Runs in-process (no os.system round trips).
"""
import sys

from ppsurf_tpu.cli import main


def run(extra=()):
    base = [
        "-c", "configs/poco.yaml",
        "-c", "configs/ppsurf.yaml",
        "-c", "configs/ppsurf_mini.yaml",
    ]
    args = list(extra)
    print("=== fit ===")
    main(["fit"] + base + args)
    print("=== test ===")
    main(["test"] + base + args)
    print("=== predict ===")
    main(["predict"] + base + args)


if __name__ == "__main__":
    run(sys.argv[1:])
