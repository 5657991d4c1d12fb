"""Training configuration — the reference's argparse surface (train.py:34-135)
as a frozen, hashable dataclass (static under jit; a config change recompiles
the step, which is how phase switches of the CC alternation are realized).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # network choices (train.py:84-91)
    dispnet: str = "DispResNet6"
    posenet: str = "PoseNetB6"
    masknet: str = "MaskNet6"
    flownet: str = "Back2Future"
    nlevels: int = 6

    # data / shapes
    sequence_length: int = 5
    height: int = 256
    width: int = 832
    batch_size: int = 4

    # optimization (train.py:65-72)
    lr: float = 2e-4
    momentum: float = 0.9          # adam beta1
    beta: float = 0.999            # adam beta2
    weight_decay: float = 0.0
    # Global-norm gradient clip, 0 = off (off matches the reference, which
    # never clips). Extension for the bf16 compute path: bf16 gradient
    # rounding noise can occasionally spike and run away (a deterministic
    # blowup reproduced at step ~1736 of the 832x256 noise soak); clipping
    # bounds those spikes. No effect on fp32 parity when left at 0.
    clip_grad_norm: float = 0.0
    # Skip optimizer updates whose gradients are non-finite (the standard
    # mixed-precision guard, optax.apply_if_finite). bf16 backward can
    # occasionally produce an inf/NaN gradient (e.g. a fully-OOB warp's
    # 1/sum(valid)); without this guard one bad step poisons the params —
    # and clip_grad_norm alone makes it WORSE (NaN global norm scales every
    # net's update to NaN). Off by default = reference parity; recommended
    # on (with clip ~5) for compute_dtype='bfloat16'. NOTE: changes the
    # opt_state pytree (adds skip counters), so checkpoints do not resume
    # across a change of this flag.
    skip_nonfinite_updates: bool = False

    # loss weights (train.py:120-130)
    cam_photo_loss_weight: float = 1.0    # -pc  (w1)
    mask_loss_weight: float = 0.0         # -m   (w2)
    smooth_loss_weight: float = 0.1       # -s   (w3)
    flow_photo_loss_weight: float = 1.0   # -pf  (w4)
    consensus_loss_weight: float = 0.1    # -c   (w5)
    qch: float = 0.5
    wrig: float = 1.0
    wbce: float = 0.5
    wssim: float = 0.0
    THRESH: float = 0.01
    lambda_oob: float = 0.0

    # modes (train.py:47-52, 77-82, 102-105)
    rotation_mode: str = "euler"
    padding_mode: str = "zeros"
    smoothness_type: str = "regular"      # 'regular' | 'edgeaware'
    spatial_normalize: bool = False
    no_non_rigid_mask: bool = False
    joint_mask_for_depth: bool = False

    # CC alternation freezes (train.py:107-114)
    fix_dispnet: bool = False
    fix_posenet: bool = False
    fix_masknet: bool = False
    fix_flownet: bool = False

    # compute
    compute_dtype: str = "float32"        # 'float32' | 'bfloat16' (nets)
    # Loss-stack dtype: 'bfloat16' casts the image payloads (tgt, refs)
    # and explainability masks to bf16 at the loss boundary — the
    # elementwise photometric/SSIM/warp-payload chain then runs at bf16
    # VPU/MXU rates and half HBM traffic. Geometry (depth, pose, flows,
    # intrinsics) and every large reduction stay fp32 (losses.charbonnier
    # .mean32). Changes loss numerics (~1e-2 relative); off by default.
    loss_dtype: str = "float32"           # 'float32' | 'bfloat16'

    @property
    def nb_ref_imgs(self) -> int:
        return self.sequence_length - 1

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
