"""Full POCO baseline campaign (parity: reference `full_run_poco.py`)."""
import os
import sys

from ppsurf_tpu.cli import main
from full_run_pps import DATASETS


def run(extra=()):
    base = ["-c", "configs/poco.yaml"]
    args = list(extra)
    print("=== fit ===")
    main(["fit"] + base + args)
    print("=== test ===")
    main(["test"] + base + ["--data.init_args.in_file", "datasets/abc/testset.txt"] + args)
    for dataset in DATASETS:
        in_file = f"datasets/{dataset}/testset.txt"
        if not os.path.isfile(in_file):
            continue
        print(f"=== predict {dataset} ===")
        main(["predict"] + base + ["--data.init_args.in_file", in_file] + args)


if __name__ == "__main__":
    run(sys.argv[1:])
