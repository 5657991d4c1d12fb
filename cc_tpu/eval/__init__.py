"""Evaluation layer: shared composite-flow logic + per-benchmark CLIs."""
from cc_tpu.eval.composite import composite_flow, rigidity_masks

__all__ = ["composite_flow", "rigidity_masks"]
