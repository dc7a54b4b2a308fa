from ppsurf_tpu.data.datasets import (  # noqa: F401
    DatasetPaths,
    ShapeDataset,
    OccupancyDataModule,
    in_file_is_dataset,
    read_shape_list,
    get_results_dir,
)
