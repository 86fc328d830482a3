"""vilgod_tpu: TPU-native zero-shot LiDAR 3D pseudo-labeling.

A ground-up JAX/XLA re-design of the ViLGOD pipeline (vision-language
guidance for unsupervised 3D object detection) for TPU hardware:
array-resident sequence state, jitted geometry kernels, a fused
render+CLIP classification path, and a mesh-sharded distribution layer.
"""
import os as _os

__version__ = "0.1.0"

# Geometry before speed: the TPU default matmul precision (single-pass
# bfloat16) corrupts coordinate math — SE3 transforms, plane distances,
# hull support functions — by ~0.1-0.4 m at LiDAR magnitudes, silently
# breaking eps-scale thresholds. Everything f32 therefore runs at full
# precision; the CLIP towers compute natively in bfloat16 (both operands),
# where this setting is a no-op. Opt out with VILGOD_MATMUL_PRECISION.
if _os.environ.get("VILGOD_MATMUL_PRECISION", "highest"):
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision",
                       _os.environ.get("VILGOD_MATMUL_PRECISION", "highest"))
