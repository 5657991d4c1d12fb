"""Model zoo registry — mirrors the reference's models/__init__.py surface.

Construction by name (as train.py:245-255 does via getattr):

    net = cc_tpu.models.build('DispResNet6')
    params = net.init(key, dummy_input, training=True)
"""
from cc_tpu.models.dispnet import (
    DispNet, DispNetS, DispNetS6, DispResNet6, DispResNetS6,
)
from cc_tpu.models.posenet import PoseNet6, PoseNetB6, PoseExpNet
from cc_tpu.models.masknet import MaskNet, MaskNet6, MaskResNet6
from cc_tpu.models.back2future import Back2Future
from cc_tpu.models.flownetc import FlowNetC6

_REGISTRY = {
    "DispNetS": DispNetS,
    "DispNetS6": DispNetS6,
    "DispResNet6": DispResNet6,
    "DispResNetS6": DispResNetS6,
    "PoseNet6": PoseNet6,
    "PoseNetB6": PoseNetB6,
    "PoseExpNet": PoseExpNet,
    "MaskNet6": MaskNet6,
    "MaskResNet6": MaskResNet6,
    "Back2Future": Back2Future,
    "FlowNetC6": FlowNetC6,
}


def build(name: str, **kwargs):
    """Construct a model by its reference-compatible name."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


__all__ = [
    "build", "DispNet", "DispNetS", "DispNetS6", "DispResNet6",
    "DispResNetS6", "PoseNet6", "PoseNetB6", "PoseExpNet", "MaskNet",
    "MaskNet6", "MaskResNet6", "Back2Future", "FlowNetC6",
]
