"""change3d_tpu — a TPU-native JAX/XLA/Pallas framework with the capabilities of
Change3D (zhuduowang/Change3D, CVPR 2025).

Change3D casts four bi-temporal remote-sensing tasks — binary change detection
(BCD), semantic change detection (SCD), building damage assessment (BDA) and
change captioning (CC) — as short-video modeling: the pre-image, N learnable
"perception frames" and the post-image are stacked into a [B, T=N+2, H, W, 3]
clip, run through an X3D-L video encoder, and the features at the perception
frame temporal indices are decoded by tiny task heads.

This package is a from-scratch TPU-first redesign (reference semantics cited
per-module as /root/reference/<file>:<line>):

- NDHWC layouts, bf16 matmul paths, fp32 norm statistics.
- Functional flax.linen modules with torch-exact BatchNorm/init semantics so
  the public Kinetics-400 ``X3D_L.pyth`` checkpoint converts losslessly.
- Data parallelism via ``jax.sharding.Mesh`` + NamedSharding (XLA collectives
  over ICI), not host-side loops.
- On-device metric accumulation (confusion matrices inside the jitted step).
- A single task-spec-driven train/eval engine replacing the reference's four
  copy-pasted scripts.
"""

__version__ = "0.4.0"

from change3d_tpu import ops, models  # noqa: F401

# Deployment surface (lazy heavy deps inside): Predictor/TiledPredictor/
# CaptionPredictor + Artifact* wrappers live in change3d_tpu.inference,
# HTTP serving in change3d_tpu.serving, the API client in
# change3d_tpu.client, AOT export in change3d_tpu.export.
