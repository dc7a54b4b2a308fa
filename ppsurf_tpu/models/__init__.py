from ppsurf_tpu.models.fkaconv import FKAConvLayer, ResidualBlock, FKAConvNetwork  # noqa: F401
from ppsurf_tpu.models.decoder import InterpAttentionKHeadsNet  # noqa: F401
from ppsurf_tpu.models.pointnet import PointNetfeat, STN, AttentionPool  # noqa: F401
from ppsurf_tpu.models.poco import PocoNetwork  # noqa: F401
from ppsurf_tpu.models.ppsurf import PPSurfNetwork  # noqa: F401
