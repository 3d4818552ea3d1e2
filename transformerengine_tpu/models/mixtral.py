"""Mixtral-class sparse-MoE causal LM — the framework's MoE flagship.

Plays the role of the reference's MoE showcase (reference: the MXFP8
grouped-MLP Mixtral benchmark headline; jax/moe.py:2071 fused EP block;
pytorch GroupedLinear + router + permutation assembled by Megatron),
built from this framework's Flax modules: RMSNorm + GQA flash attention
+ RoPE + top-k routed ``MoELayerNormMLP`` (dropless EP, block-scaled
grouped GEMM under MXFP8/blockwise recipes).

The per-layer router aux losses are sown into ``"intermediates"``;
``mixtral_loss`` adds their sum to the token cross entropy.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..attention import AttnMaskType, SequenceDescriptor
from ..flax.module import LayerNorm, _maybe_partition
from ..flax.transformer import TransformerLayer
from ..parallel import sharding as sh
from .llama import _remat_policy, cross_entropy_loss


@dataclasses.dataclass(frozen=True)
class MixtralConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336   # per-expert FFN width
    num_layers: int = 32
    num_attention_heads: int = 32
    num_kv_heads: int = 8
    head_dim: Optional[int] = None
    num_experts: int = 8
    topk: int = 2
    aux_loss_coeff: float = 1e-2
    max_seq_len: int = 8192
    rope_base: float = 1e6
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    remat: bool = False
    remat_policy: str = "nothing_saveable"
    scan_layers: bool = False
    context_parallel_axis: str = ""
    # Expert parallelism: set when the model runs under shard_map with
    # this mesh axis; tokens ride exact-size ragged all-to-alls.
    ep_axis: str = ""
    dropless: bool = True


MIXTRAL_TINY = MixtralConfig(vocab_size=256, hidden_size=128,
                             intermediate_size=256, num_layers=2,
                             num_attention_heads=4, num_kv_heads=2,
                             num_experts=4, topk=2, max_seq_len=512,
                             rope_base=10000.0)
MIXTRAL_8X7B = MixtralConfig()


class _ScanMoEBlock(TransformerLayer):
    """(carry, out) convention for nn.scan; decoder-only."""

    @nn.compact
    def __call__(self, x, sequence_descriptor=None, positions=None,
                 deterministic=True, inference_params=None):
        y = TransformerLayer.__call__(
            self, x, None, sequence_descriptor, positions, deterministic,
            inference_params)
        return y, None


class MixtralModel(nn.Module):
    """Decoder-only sparse-MoE transformer LM."""

    config: MixtralConfig

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

        layer_kwargs = dict(
            hidden_size=cfg.hidden_size,
            mlp_hidden_size=cfg.intermediate_size,
            num_attention_heads=cfg.num_attention_heads,
            head_dim=cfg.head_dim,
            num_gqa_groups=cfg.num_kv_heads,
            layernorm_epsilon=cfg.norm_eps,
            norm_type="rmsnorm",
            mlp_activations="swiglu",
            use_bias=False,
            self_attn_mask_type=(
                AttnMaskType.PADDING_CAUSAL
                if sequence_descriptor is not None else
                AttnMaskType.CAUSAL),
            enable_rotary_pos_emb=True,
            rotary_pos_emb_base=cfg.rope_base,
            max_seq_len=cfg.max_seq_len,
            context_parallel_axis=cfg.context_parallel_axis,
            num_moe_experts=cfg.num_experts,
            moe_topk=cfg.topk,
            moe_aux_loss_coeff=cfg.aux_loss_coeff,
            moe_ep_axis=cfg.ep_axis,
            moe_dropless=cfg.dropless,
            dtype=cfg.dtype)

        if cfg.scan_layers:
            block = _ScanMoEBlock
            if cfg.remat:
                block = nn.remat(
                    _ScanMoEBlock, static_argnums=(4, 5),
                    policy=_remat_policy(cfg.remat_policy))
            scanned = nn.scan(
                block,
                variable_axes={"params": 0, "quantize_meta": 0, "cache": 0,
                               "intermediates": 0, "moe_state": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 4,
                length=cfg.num_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )(**layer_kwargs, name="layers")
            x, _ = scanned(x, sequence_descriptor, positions,
                           deterministic, inference_params)
        else:
            layer_cls = TransformerLayer
            if cfg.remat:
                layer_cls = nn.remat(
                    TransformerLayer, static_argnums=(4, 5),
                    policy=_remat_policy(cfg.remat_policy))
            for i in range(cfg.num_layers):
                x = layer_cls(**layer_kwargs, name=f"layer_{i}")(
                    x, None, sequence_descriptor, positions,
                    deterministic, inference_params)

        x = LayerNorm(epsilon=cfg.norm_eps, norm_type="rmsnorm",
                      name="final_norm")(x)
        logits = jnp.einsum("bsh,vh->bsv", x, embed,
                            preferred_element_type=jnp.float32)
        return logits


def collect_aux_loss(intermediates: dict) -> jax.Array:
    """Sum every sown ``moe_aux_loss`` (scan stacks them on axis 0)."""
    total = jnp.float32(0.0)
    for path, leaf in jax.tree_util.tree_leaves_with_path(intermediates):
        if any(getattr(p, "key", None) == "moe_aux_loss" for p in path):
            total = total + jnp.sum(leaf)
    return total


def mixtral_loss(model: MixtralModel, variables: dict, tokens: jax.Array,
                 targets: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
    """Token CE + summed router aux loss."""
    logits, mut = model.apply(variables, tokens, mutable=["intermediates"])
    return (cross_entropy_loss(logits, targets, mask)
            + collect_aux_loss(mut["intermediates"]))
