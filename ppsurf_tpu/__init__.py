"""ppsurf_tpu — a TPU-native (JAX/XLA/Pallas) surface-reconstruction framework.

Re-implements the capabilities of PPSurf ("Combining Patches and Point
Convolutions for Detailed Surface Reconstruction", CGF 2024; reference
implementation cg-tuwien/ppsurf) as an idiomatic TPU-first framework:

- The entire spatial-graph datapath (progressive support-point subsampling and
  all k-NN index sets, reference `source/poco_data_loader.py:137-240`) runs
  *on device inside the jitted step function* instead of in CPU DataLoader
  worker processes.
- Networks are pure-functional flax modules in channels-last layout so the
  FKAConv gather-matmul and the decoder attention land on the MXU.
- Reconstruction evaluates the implicit field in large static-shape query
  tiles; region growing is driven by a vectorized host loop; marching cubes
  and mesh cleanup run in first-party host code (numpy + C++).
- Scaling is expressed with `jax.sharding.Mesh` + `shard_map`; gradients are
  reduced with `psum` over the ICI `data` axis (replacing Lightning DDP/NCCL,
  reference `configs/device_server.yaml`).
"""

__version__ = "0.1.0"
