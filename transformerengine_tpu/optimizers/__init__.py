"""Fused optimizers (reference: transformer_engine/pytorch/optimizers)."""
from .fused_adam import fused_adam, fused_sgd, muon, newton_schulz
from .multi_tensor import (clip_by_global_norm,
                           multi_tensor_compute_scale_and_scale_inv,
                           multi_tensor_l2norm, multi_tensor_scale,
                           multi_tensor_unscale_l2norm)
