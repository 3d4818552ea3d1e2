"""Flax (linen) module API (reference: transformer_engine/jax/flax)."""
from .module import (
    DenseGeneral, LayerNorm, LayerNormDenseGeneral, LayerNormMLP,
    Softmax, TransformerEngineBase, update_quantize_meta, QUANTIZE_META)
from .moe import MoELayerNormMLP
from .transformer import (
    DotProductAttention, MultiHeadAttention, RelativePositionBiases,
    RotaryPositionEmbedding, TransformerLayer)
from ..parallel.sharding import extend_logical_axis_rules
