"""Full training + evaluation campaign for PPSurf 50NN.

Parity: reference `full_run_pps.py` — fit on the ABC training set, test,
predict over the paper's test datasets, then build comparison reports.
"""
import os
import sys

from ppsurf_tpu.cli import main

DATASETS = [
    "abc", "abc_extra_noisy", "abc_noisefree",
    "famous_original", "famous_noisefree", "famous_sparse", "famous_dense",
    "famous_extra_noisy", "thingi10k_scans_original", "thingi10k_scans_dense",
    "thingi10k_scans_sparse", "thingi10k_scans_extra_noisy",
    "thingi10k_scans_noisefree", "real_world",
]


def run(extra=()):
    base = [
        "-c", "configs/poco.yaml",
        "-c", "configs/ppsurf.yaml",
        "-c", "configs/ppsurf_50nn.yaml",
    ]
    args = list(extra)
    print("=== fit ===")
    main(["fit"] + base + args)
    print("=== test ===")
    main(
        ["test"] + base
        + ["--data.init_args.in_file", "datasets/abc/testset.txt"] + args
    )
    for dataset in DATASETS:
        in_file = f"datasets/{dataset}/testset.txt"
        if not os.path.isfile(in_file):
            print(f"skip {dataset}: {in_file} missing")
            continue
        print(f"=== predict {dataset} ===")
        main(["predict"] + base + ["--data.init_args.in_file", in_file] + args)

    from ppsurf_tpu.eval.make_comparison import main as comp_main

    present = [d for d in DATASETS if os.path.isfile(f"datasets/{d}/testset.txt")]
    if present:
        comp_main(["--dataset_names"] + present)


if __name__ == "__main__":
    run(sys.argv[1:])
