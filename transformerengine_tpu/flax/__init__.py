"""Flax (linen) module API (reference: transformer_engine/jax/flax)."""
from .module import (
    DenseGeneral, LayerNorm, LayerNormDenseGeneral, LayerNormMLP,
    Softmax, TransformerEngineBase, update_quantize_meta, QUANTIZE_META)
from .moe import MoELayerNormMLP
from .module import (
    make_dot_general_cls, make_grouped_dense_cls,
    wrap_function_in_te_state_module)
from .transformer import (
    DotProductAttention, MultiHeadAttention, RelativePositionBiases,
    RotaryPositionEmbedding, TransformerLayer, TransformerLayerType)
from ..parallel.sharding import extend_logical_axis_rules
