"""trase_tpu — a TPU-native (JAX/XLA/Pallas) framework for tracking-free 4D
Gaussian-splatting segmentation and editing.

Re-implements the full capability surface of the TRASE reference
(deformable 3D Gaussian splatting + a learned 32-dim per-Gaussian
segmentation feature field, weakly supervised from SAM masks, with
unsupervised clustering and direct Gaussian-set editing) as an
idiomatic JAX framework:

- the differentiable rasterizer is a tile-sorted compositor expressed as
  dense XLA ops + Pallas kernels (``trase_tpu.ops``), not a CUDA port;
- scene state is a fixed-capacity pytree with an alive-mask
  (``trase_tpu.models.gaussians``), so densify/prune compile statically;
- training steps are pure jitted functions over optax states
  (``trase_tpu.engine``);
- multi-device scaling uses ``jax.sharding`` meshes (``trase_tpu.parallel``).
"""

__version__ = "0.1.0"

import jax as _jax

# float32 matmuls must be real float32: covariance/projection/compositing
# math breaks at bf16 granularity. Hot paths that can tolerate bf16 opt in
# explicitly with jnp.bfloat16 inputs.
_jax.config.update("jax_default_matmul_precision", "highest")
