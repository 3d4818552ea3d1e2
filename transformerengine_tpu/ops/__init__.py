"""Kernel/op library: Pallas kernels + pure-JAX ground truths
(reference: transformer_engine/common kernel families)."""
from .activation import act_lu, dact_lu, is_gated, normalize_activation_type
from .cross_entropy import cross_entropy, parallel_cross_entropy
from .gemm import dequantize_any, tn_dot
from .grouped_gemm import grouped_gemm, grouped_gemm_dw
from .normalization import (
    layernorm_bwd, layernorm_fwd, rmsnorm_bwd, rmsnorm_bwd_add, rmsnorm_fwd)
from .rope import (apply_rope, apply_rope_qkv, apply_rope_thd,
                   rope_frequencies)
from .router import (
    compute_routing, fused_moe_aux_loss, fused_topk_with_score_function)

# The te.ops fusible-operation API (reference: pytorch/ops/*) lives in
# ..fuser and is re-exported here so `te.ops.Sequential(...)` reads the
# same as the reference's `te.ops.Sequential`.
from ..fuser import (  # noqa: E402
    Activation, AddExtraInput, AllGather, AllReduce, Bias, ConstantScale,
    Dropout, GELU, GeGLU, GroupedLinear, Identity, L2Normalization,
    LayerNorm, Linear, MakeExtraOutput, Op, Quantize, ReLU, ReduceScatter,
    Reshape, RMSNorm, Sequential, SwiGLU)
