"""diffusion_extensions_tpu: a TPU-native JAX framework for denoising
diffusion on SO(3) and SE(3).

Brand-new implementation of the capabilities of the reference
``qazwsxal/diffusion-extensions`` PyTorch codebase, re-designed for TPU:
pure-functional diffusion processes over schedule pytrees, precomputed
IGSO(3) inverse-CDF tables, ``lax.scan`` reverse samplers, Pallas kernels
for the hot numeric loops, and ``shard_map`` data parallelism over an ICI
device mesh.
"""

__version__ = "0.1.0"
