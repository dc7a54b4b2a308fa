from ppsurf_tpu.recon.marching_cubes import marching_cubes  # noqa: F401
from ppsurf_tpu.recon.mesh_ops import (  # noqa: F401
    clean_simple,
    remove_small_connected_components,
)
