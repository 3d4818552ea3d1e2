"""Gemma-class causal LM — second dense flagship family.

Counterpart of the reference's te_gemma tutorial model (reference:
docs/examples/te_gemma/te_gemma.py — HF Gemma with TE TransformerLayer
substituted, FP8 KV-cache generation). Distinctives vs Llama, all
expressed through existing module features: GeGLU MLP, RMSNorm in the
Gemma "1 + gamma" convention (``zero_centered_gamma``), embeddings
scaled by sqrt(hidden), wide head_dim decoupled from hidden size, MQA
(num_kv_heads=1) for the small config, and optional final-logit
soft-capping.
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
class GemmaConfig:
    vocab_size: int = 256000
    hidden_size: int = 3072
    intermediate_size: int = 24576
    num_layers: int = 28
    num_attention_heads: int = 16
    num_kv_heads: int = 16
    head_dim: int = 256
    max_seq_len: int = 8192
    rope_base: float = 10000.0
    norm_eps: float = 1e-6
    # tanh soft-cap on the LM-head logits (Gemma-2 style); 0 disables.
    final_logit_softcap: float = 0.0
    dtype: Any = jnp.bfloat16
    remat: bool = False
    remat_policy: str = "nothing_saveable"
    scan_layers: bool = False
    context_parallel_axis: str = ""


GEMMA_TINY = GemmaConfig(vocab_size=256, hidden_size=128,
                         intermediate_size=512, num_layers=2,
                         num_attention_heads=4, num_kv_heads=1,
                         head_dim=64, max_seq_len=512)
GEMMA_2B = GemmaConfig(vocab_size=256000, hidden_size=2048,
                       intermediate_size=16384, num_layers=18,
                       num_attention_heads=8, num_kv_heads=1,
                       head_dim=256)
GEMMA_7B = GemmaConfig()


class _ScanBlock(TransformerLayer):
    @nn.compact
    def __call__(self, x, sequence_descriptor=None, positions=None,
                 deterministic=True, inference_params=None):
        y = TransformerLayer.__call__(
            self, x, None, sequence_descriptor, positions, deterministic,
            inference_params)
        return y, None


class GemmaModel(nn.Module):
    """Decoder-only Gemma LM (tied embeddings)."""

    config: GemmaConfig

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
        # Gemma scales embeddings by sqrt(hidden) (te_gemma.py normalizer).
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, cfg.dtype)
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
            zero_centered_gamma=True,        # Gemma's (1 + gamma) RMSNorm
            mlp_activations="geglu",
            use_bias=False,
            self_attn_mask_type=(
                AttnMaskType.PADDING_CAUSAL
                if sequence_descriptor is not None else
                AttnMaskType.CAUSAL),
            enable_rotary_pos_emb=True,
            rotary_pos_emb_base=cfg.rope_base,
            max_seq_len=cfg.max_seq_len,
            context_parallel_axis=cfg.context_parallel_axis,
            dtype=cfg.dtype)

        if cfg.scan_layers:
            block = _ScanBlock
            if cfg.remat:
                block = nn.remat(_ScanBlock, static_argnums=(4, 5),
                                 policy=_remat_policy(cfg.remat_policy))
            scanned = nn.scan(
                block,
                variable_axes={"params": 0, "quantize_meta": 0, "cache": 0},
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
                      zero_centered_gamma=True, name="final_norm")(x)
        logits = jnp.einsum("bsh,vh->bsv", x, embed,
                            preferred_element_type=jnp.float32)
        if cfg.final_logit_softcap > 0:
            c = cfg.final_logit_softcap
            logits = c * jnp.tanh(logits / c)
        return logits


gemma_loss = cross_entropy_loss
