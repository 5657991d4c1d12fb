"""cc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for Competitive Collaboration.

A from-scratch rebuild of the capabilities of the reference implementation
(anuragranj/cc, CVPR 2019: "Competitive Collaboration: Joint Unsupervised Learning of
Depth, Camera Motion, Optical Flow and Motion Segmentation"), designed TPU-first:

- NHWC layouts everywhere (TPU-native); NCHW only at I/O edges.
- Pure-functional geometry/loss core (jnp), differentiable end to end.
- Flax linen model zoo: DispNetS/DispNetS6/DispResNet6/DispResNetS6 (D),
  PoseNet6/PoseNetB6/PoseExpNet (C), MaskNet6/MaskResNet6 (M),
  Back2Future/FlowNetC6 (F).
- Correlation cost volumes as fused TPU kernels (Pallas) with an XLA fallback.
- One jitted, donated train step covering all four nets + five CC losses,
  sharded over a 1-D batch mesh (pjit / NamedSharding) that scales from one
  chip to a pod slice unchanged.
- Orbax checkpointing, host-side data pipeline with device prefetch.
"""

__version__ = "0.1.0"
