"""lidog_tpu — a TPU-native framework for domain-generalized LiDAR semantic segmentation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the LiDOG reference
framework (saltoricristiano/lidog): sparse-voxel U-Nets (MinkUNet34 family) with
an auxiliary dense BEV decoder, 8 domain-generalization baselines, dataset
loaders for SemanticKITTI / nuScenes / Synth4D, and pjit/shard_map data-parallel
training over TPU meshes.

Design (TPU-first, not a port):
  * Static shapes everywhere: sparse tensors are padded (coords, feats, mask)
    buckets per stride level, so every train step compiles once.
  * All sparse convolutions (stem k=5, residual k=3, strided down k=2s2 and
    transposed up convs) lower to ONE gather-GEMM primitive driven by
    precomputed neighbor tables ("kernel maps"), built on device with
    sort + vectorized binary search.
  * BatchNorm is masked and cross-replica (psum over the data mesh axis),
    replacing MinkowskiSyncBatchNorm + DDP.
  * The dense BEV rasterization (reference `sparse2super`,
    utils/models/minkunet_bev.py:169-230) becomes a single fused scatter-max
    directly into the pooled grid — no per-sample Python loop, no 2000^2
    intermediate.
"""

__version__ = "0.1.0"

from lidog_tpu.core.sparse import SparseTensor  # noqa: F401
