"""Numerics-debug toolkit (reference: transformer_engine/debug)."""
from .api import (
    DebugQuantizer, DebugState, get_state, initialize, step,
    wrap_quantizer_set)
from .stats import (
    StatsBuffer, compute_blockwise_dynamic_range, compute_tensor_stats)
