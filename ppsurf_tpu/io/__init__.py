from ppsurf_tpu.io.ply import load_ply, save_ply, Mesh  # noqa: F401
from ppsurf_tpu.io.point_cloud import load_pts, load_xyz, write_xyz  # noqa: F401
