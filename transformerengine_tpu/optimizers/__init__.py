"""Fused optimizers (reference: transformer_engine/pytorch/optimizers)."""
from .fused_adam import fused_adam, fused_sgd, muon, newton_schulz
