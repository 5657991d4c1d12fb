"""CC loss library — exact behavioral parity with /root/reference/loss_functions.py.

Known reference quirks reproduced deliberately (SURVEY.md §2.2):
- occlusion_masks uses (flow_fw + flow_bw).sum(ch) > 0.08*|mag|^2 + 1 — both
  outputs are identical by construction; canonical semantics kept.
- edge_aware_smoothness_loss computes a per-scale weight but never applies it.
- consensus_exp_masks receives a smoothness weight `ws` that is unused.
Quirks NOT reproduced (they crash in the reference): --robust loss selection
(NameError, train.py:430-432) and compute_joint_mask_for_depth's 3-arg call
(train.py:479); here the joint-mask path takes THRESH explicitly.
"""
from cc_tpu.losses.charbonnier import robust_l1, robust_l1_per_pix, spatial_normalize
from cc_tpu.losses.ssim import ssim
from cc_tpu.losses.photometric import (
    photometric_reconstruction_loss,
    photometric_flow_loss,
    occlusion_masks,
    depth_occlusion_masks,
)
from cc_tpu.losses.explainability import (
    explainability_loss,
    gaussian_explainability_loss,
    logical_or,
)
from cc_tpu.losses.consensus import (
    consensus_exp_masks,
    consensus_depth_flow_mask,
    compute_joint_mask_for_depth,
    weighted_binary_cross_entropy,
)
from cc_tpu.losses.smoothness import smooth_loss, edge_aware_smoothness_loss
from cc_tpu.losses.metrics import (
    compute_epe,
    compute_all_epes,
    outlier_err,
    flow_diff,
    compute_depth_errors,
)

EPSILON = 1e-8

__all__ = [
    "robust_l1", "robust_l1_per_pix", "spatial_normalize", "ssim",
    "photometric_reconstruction_loss", "photometric_flow_loss",
    "occlusion_masks", "depth_occlusion_masks",
    "explainability_loss", "gaussian_explainability_loss", "logical_or",
    "consensus_exp_masks", "consensus_depth_flow_mask",
    "compute_joint_mask_for_depth", "weighted_binary_cross_entropy",
    "smooth_loss", "edge_aware_smoothness_loss",
    "compute_epe", "compute_all_epes", "outlier_err", "flow_diff",
    "compute_depth_errors", "EPSILON",
]
