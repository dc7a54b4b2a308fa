from ppsurf_tpu.eval.reports import (  # noqa: F401
    export_table,
    make_test_report,
    make_quantitative_comparison,
    make_dataset_comparison,
    assemble_quantitative_comparison,
    read_metrics_table,
)
