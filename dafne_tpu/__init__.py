"""DAFNe-TPU: a TPU-native (JAX/XLA/Pallas) oriented object detection framework.

A from-scratch re-design of the capabilities of braun-steven/DAFNe
(dense anchor-free oriented object detection, arXiv 2109.06148) for TPU:

- NHWC flax models compiled to XLA (ResNet+FPN backbone, DAFNe head)
- fully-batched target assignment (no per-image Python loops)
- static-shape decode (fixed-size top-k + validity masks)
- rotated quadrilateral NMS on-device (Pallas / XLA)
- SPMD data parallelism over a `jax.sharding.Mesh`
- host-side data pipeline, evaluation (exact polygon IoU) and DOTA tiling
"""

__version__ = "0.1.0"
