from ppsurf_tpu.parallel.mesh import get_data_mesh, shard_batch  # noqa: F401
