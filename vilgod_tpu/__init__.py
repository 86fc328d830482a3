"""vilgod_tpu: TPU-native zero-shot LiDAR 3D pseudo-labeling.

A ground-up JAX/XLA re-design of the ViLGOD pipeline (vision-language
guidance for unsupervised 3D object detection) for TPU hardware:
array-resident sequence state, jitted geometry kernels, a fused
render+CLIP classification path, and a mesh-sharded distribution layer.
"""

__version__ = "0.1.0"
