"""mcvd_tpu — a TPU-native JAX/XLA/Pallas rebuild of MCVD (Masked Conditional
Video Diffusion; voletiv/mcvd-pytorch).

This is not a port: the compute path is flax/JAX with NHWC layouts, samplers
are `jax.lax.scan` programs over precomputed schedule tables, parallelism is a
`jax.sharding.Mesh` + pjit data-parallel step, and the hot ops have Pallas TPU
kernels with lax reference implementations.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
