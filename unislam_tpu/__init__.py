"""Uni-SLAM TPU: a TPU-native (JAX/XLA/Pallas) uncertainty-aware neural
implicit SLAM framework.

A from-scratch re-design of the capabilities of dfki-av/Uni-SLAM (WACV 2025)
for TPU hardware:

- The CUDA tiny-cuda-nn hash-grid encoders + fused MLPs become a pure-JAX
  multiresolution hash encoding plus a fused Pallas gather+MLP kernel
  (reference: /root/reference/src/UNISLAM.py:224-259,
  /root/reference/src/networks/decoders.py).
- The two-process tracker/mapper with shared CUDA memory becomes a single
  process driving two jitted optimization steps over one scene-parameter
  pytree (reference: /root/reference/src/UNISLAM.py:90-137).
- Ray batches shard over a `('rays',)` device mesh; hash-table and MLP
  gradients are all-reduced over ICI by XLA.
"""

__version__ = "0.1.0"
