from ppsurf_tpu.ops.knn import knn, masked_knn  # noqa: F401
from ppsurf_tpu.ops.subsample import voxel_subsample, random_subsample  # noqa: F401
from ppsurf_tpu.ops.patches import extract_local_patches, patch_space  # noqa: F401
from ppsurf_tpu.ops.graph import build_fkaconv_graph, build_proj_ids  # noqa: F401
