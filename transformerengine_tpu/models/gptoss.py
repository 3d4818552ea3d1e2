"""GPT-OSS-class sparse-MoE causal LM — sinks + banded attention flagship.

Exercises the framework features the reference added for this model
family (reference: clamped-swiglu kernels `common/activation`
nvte_clamped_swiglu / ClampedSwiGLUParam; softmax sink types
fused_attn.h NVTE_Softmax_Type): top-k routed experts with the clamped
SwiGLU gate (limit 7, alpha 1.702), learnable per-head attention sinks
in every layer, and alternating banded attention — even layers see a
128-token sliding window, odd layers the full causal context.

Built entirely from this framework's modules: the sinks run inside the
Pallas flash kernel (prefill) and the decode/paged-decode kernels
(serving), the experts through the dropless EP MoE block.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..attention import AttnMaskType, SequenceDescriptor, SoftmaxType
from ..flax.module import LayerNorm, _maybe_partition
from ..flax.transformer import TransformerLayer
from ..parallel import sharding as sh
from .llama import _remat_policy, cross_entropy_loss
from .mixtral import collect_aux_loss


@dataclasses.dataclass(frozen=True)
class GptOssConfig:
    vocab_size: int = 201088
    hidden_size: int = 2880
    head_dim: int = 64
    num_attention_heads: int = 64
    num_kv_heads: int = 8
    num_layers: int = 24
    num_experts: int = 32
    topk: int = 4
    intermediate_size: int = 2880        # per-expert FFN width
    sliding_window: int = 128            # even layers; odd layers full
    use_bias: bool = True
    aux_loss_coeff: float = 0.0          # router trained loss-free
    max_seq_len: int = 4096
    rope_base: float = 150000.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    remat: bool = False
    remat_policy: str = "nothing_saveable"
    ep_axis: str = ""
    dropless: bool = True


GPTOSS_TINY = GptOssConfig(
    vocab_size=256, hidden_size=128, head_dim=32, num_attention_heads=4,
    num_kv_heads=2, num_layers=2, num_experts=4, topk=2,
    intermediate_size=128, sliding_window=32, max_seq_len=256,
    rope_base=10000.0)
GPTOSS_20B = GptOssConfig()
GPTOSS_120B = GptOssConfig(num_layers=36, num_experts=128,
                           hidden_size=2880)


class GptOssModel(nn.Module):
    """Decoder-only MoE transformer with attention sinks and alternating
    banded/full attention. Layers are materialized individually (no
    scan-over-layers) because the window is a per-layer static."""

    config: GptOssConfig

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,                   # (B, S) int32
        sequence_descriptor: Optional[SequenceDescriptor] = None,
        positions: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        inference_params=None,
    ) -> jax.Array:                          # (B, S, vocab)
        cfg = self.config
        embed = self.param(
            "embedding",
            _maybe_partition(nn.initializers.normal(stddev=1.0),
                             (sh.W_JOINED_AXES, sh.W_TP_AXES)),
            (cfg.vocab_size, cfg.hidden_size), cfg.dtype)
        x = embed[tokens]
        x = nn.with_logical_constraint(
            x, (sh.BATCH_AXES, sh.SEQLEN_AXES, sh.HIDDEN_AXES))

        common = dict(
            hidden_size=cfg.hidden_size,
            mlp_hidden_size=cfg.intermediate_size,
            num_attention_heads=cfg.num_attention_heads,
            head_dim=cfg.head_dim,
            num_gqa_groups=cfg.num_kv_heads,
            layernorm_epsilon=cfg.norm_eps,
            norm_type="rmsnorm",
            mlp_activations="clamped_swiglu",
            use_bias=cfg.use_bias,
            self_attn_mask_type=(
                AttnMaskType.PADDING_CAUSAL
                if sequence_descriptor is not None else
                AttnMaskType.CAUSAL),
            softmax_type=SoftmaxType.LEARNABLE,
            enable_rotary_pos_emb=True,
            rotary_pos_emb_base=cfg.rope_base,
            max_seq_len=cfg.max_seq_len,
            num_moe_experts=cfg.num_experts,
            moe_topk=cfg.topk,
            moe_aux_loss_coeff=cfg.aux_loss_coeff,
            moe_ep_axis=cfg.ep_axis,
            moe_dropless=cfg.dropless,
            dtype=cfg.dtype)

        layer_cls = TransformerLayer
        if cfg.remat:
            layer_cls = nn.remat(
                TransformerLayer, static_argnums=(4, 5),
                policy=_remat_policy(cfg.remat_policy))
        for i in range(cfg.num_layers):
            window: Optional[Tuple[int, int]] = (
                (cfg.sliding_window, 0) if i % 2 == 0 else None)
            x = layer_cls(**common, window_size=window,
                          name=f"layer_{i}")(
                x, None, sequence_descriptor, positions,
                deterministic, inference_params)

        x = LayerNorm(epsilon=cfg.norm_eps, norm_type="rmsnorm",
                      name="final_norm")(x)
        logits = jnp.einsum("bsh,vh->bsv", x, embed,
                            preferred_element_type=jnp.float32)
        return logits


def gptoss_loss(model: GptOssModel, variables: dict, tokens: jax.Array,
                targets: jax.Array,
                mask: Optional[jax.Array] = None) -> jax.Array:
    """Token CE (+ router aux loss when aux_loss_coeff > 0)."""
    logits, mut = model.apply(variables, tokens, mutable=["intermediates"])
    return (cross_entropy_loss(logits, targets, mask)
            + collect_aux_loss(mut["intermediates"]))
