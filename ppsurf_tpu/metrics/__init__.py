from ppsurf_tpu.metrics.classification import (  # noqa: F401
    binary_confusion_jax,
    compare_predictions_binary_arrays,
    metrics_from_confusion,
    rmse,
)
