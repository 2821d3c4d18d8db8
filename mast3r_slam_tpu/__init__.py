"""mast3r_slam_tpu — a TPU-native dense SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MASt3R-SLAM
(reference: yshhdec/mast3r-slam-ysh): two-view pointmap prediction with a
ViT-L foundation model, projective ray matching, Sim(3) Gauss-Newton
tracking, retrieval-based loop closure and global pose-graph optimization —
engineered for TPU hardware (MXU-friendly batched kernels, static shapes,
mesh sharding for multi-chip scale-out).
"""

__version__ = "0.1.0"
