"""deepfactors_tpu — a TPU-native dense monocular SLAM framework.

A from-scratch JAX/XLA/Pallas system with the capabilities of DeepFactors
(jczarnowski/DeepFactors): latent-code dense depth, photometric /
reprojection / geometric factors over SE(3) poses and codes, coarse-to-fine
incremental mapping, dense tracking, and loop closure — designed for TPU
(static shapes, fused MXU-friendly reductions, sharded multi-chip BA).
"""

__version__ = "0.1.0"
