"""Flax transformer building blocks.

TPU counterpart of the reference Flax transformer stack (reference:
jax/flax/transformer.py — DotProductAttention :446, MultiHeadAttention
:1069, TransformerLayer :1847; pytorch/transformer.py:70). Sharding is
expressed through logical axes resolved by
``parallel.sharding.generate_sharding_rules``.
"""
from __future__ import annotations

import enum
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..attention import (
    AttnBiasType, AttnMaskType, CPStrategy, SequenceDescriptor, fused_attn)
from ..ops.rope import apply_rope, rope_frequencies
from ..parallel import sharding as sh
from .module import (
    DenseGeneral, LayerNormDenseGeneral, LayerNormMLP, LayerNorm,
    TransformerEngineBase, _maybe_partition)


class RotaryPositionEmbedding(nn.Module):
    """(reference: pytorch/attention/rope.py RotaryPositionEmbedding)"""

    dim: int
    max_seq_len: int = 8192
    base: float = 10000.0
    interleaved: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, positions: Optional[jax.Array] = None):
        freqs = rope_frequencies(self.dim, self.max_seq_len, base=self.base)
        return apply_rope(x, freqs, positions=positions,
                         interleaved=self.interleaved)


class RelativePositionBiases(nn.Module):
    """T5-style trained relative-position attention bias
    (reference: jax/flax/transformer.py:1735).

    Maps query-key distance to one of ``num_buckets`` learned embeddings
    per head — exact distances for nearby pairs, log-spaced buckets out
    to ``max_distance`` — and returns a (1, H, q_len, k_len) bias to add
    to attention logits (``attn_bias_type=POST_SCALE_BIAS``).
    """

    num_buckets: int = 32
    max_distance: int = 128
    num_attention_heads: int = 8
    embedding_init: Callable = nn.initializers.variance_scaling(
        1.0, "fan_avg", "uniform")
    embedding_axes: Tuple[str, ...] = ()
    dtype: Any = jnp.float32

    @staticmethod
    def _bucket(relative_position: jax.Array, bidirectional: bool,
                num_buckets: int, max_distance: int) -> jax.Array:
        """Distance -> bucket index, vectorized and jit-friendly."""
        rp = relative_position
        bucket = jnp.zeros_like(rp)
        if bidirectional:
            num_buckets //= 2
            bucket += jnp.where(rp > 0, num_buckets, 0)
            rp = jnp.abs(rp)
        else:
            rp = -jnp.minimum(rp, 0)  # only attend to the past
        max_exact = num_buckets // 2
        is_small = rp < max_exact
        # log-spaced buckets from max_exact to num_buckets for distances
        # up to max_distance; clamp beyond.
        log_ratio = jnp.log(rp.astype(jnp.float32) / max_exact
                            + jnp.float32(1e-6))
        log_denom = jnp.log(max_distance / max_exact)
        large = max_exact + (log_ratio / log_denom
                             * (num_buckets - max_exact)).astype(rp.dtype)
        large = jnp.minimum(large, num_buckets - 1)
        return bucket + jnp.where(is_small, rp, large)

    @nn.compact
    def __call__(self, q_seqlen: int, k_seqlen: int,
                 bidirectional: bool = True) -> jax.Array:
        context_position = jnp.arange(q_seqlen, dtype=jnp.int32)[:, None]
        memory_position = jnp.arange(k_seqlen, dtype=jnp.int32)[None, :]
        relative_position = memory_position - context_position
        buckets = self._bucket(relative_position, bidirectional,
                               self.num_buckets, self.max_distance)
        embedding = self.param(
            "rel_embedding",
            _maybe_partition(self.embedding_init, self.embedding_axes),
            (self.num_buckets, self.num_attention_heads), self.dtype)
        onehot = jax.nn.one_hot(buckets, self.num_buckets,
                                dtype=self.dtype)           # (q, k, B)
        bias = jnp.einsum("qkb,bh->hqk", onehot, embedding)
        return bias[None].astype(self.dtype)                # (1, H, q, k)


class DotProductAttention(nn.Module):
    """Scaled dot-product attention core
    (reference: jax/flax/transformer.py:446)."""

    head_dim: int
    num_attention_heads: int
    num_gqa_groups: Optional[int] = None
    attn_mask_type: AttnMaskType = AttnMaskType.CAUSAL
    attn_bias_type: AttnBiasType = AttnBiasType.NO_BIAS
    attention_dropout: float = 0.0
    window_size: Optional[Tuple[int, int]] = None
    scale_factor: Optional[float] = None
    context_parallel_axis: str = ""
    softmax_type: Any = None             # attention.SoftmaxType (sinks)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,                    # (B, Sq, Hq, D)
        key: jax.Array,                      # (B, Skv, Hkv, D)
        value: jax.Array,
        sequence_descriptor: Optional[SequenceDescriptor] = None,
        bias: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        softmax_offset: Optional[jax.Array] = None,
    ) -> jax.Array:
        from ..attention import SoftmaxType
        stype = self.softmax_type or SoftmaxType.VANILLA
        if stype is SoftmaxType.LEARNABLE and softmax_offset is None:
            softmax_offset = self.param(
                "softmax_offset", nn.initializers.zeros,
                (self.num_attention_heads,), jnp.float32)
        dropout = 0.0 if deterministic else self.attention_dropout
        seed = None
        if dropout > 0.0:
            seed = self.make_rng("dropout")
        cp = (CPStrategy.RING if self.context_parallel_axis
              else CPStrategy.DEFAULT)
        # FP8 DPA: under an active recipe with fp8_dpa=True, quantize
        # Q/K/V per-tensor inside the flash kernel boundary (reference:
        # pytorch DotProductAttention fp8_dpa / NVTE fused_attn_fp8).
        qkv_quantizers = None
        from ..quantize.helper import get_quantize_config
        cfg = get_quantize_config()
        if (cfg.enabled and getattr(cfg.recipe, "fp8_dpa", False)
                and bias is None and dropout == 0.0
                and not self.context_parallel_axis):
            from ..quantize.dtypes import float8_e4m3
            from ..quantize.quantizer import (CurrentScaleQuantizer,
                                              QuantizeLayout)
            from ..quantize.scaling_modes import ScalingMode
            mk = lambda: CurrentScaleQuantizer(
                scaling_mode=ScalingMode.CURRENT_TENSOR_SCALING,
                q_layout=QuantizeLayout.ROWWISE,
                q_dtype=jnp.dtype(float8_e4m3))
            qkv_quantizers = (mk(), mk(), mk())
        out = fused_attn(
            (query, key, value),
            bias=bias,
            sequence_descriptor=sequence_descriptor,
            seed=seed,
            attn_bias_type=self.attn_bias_type,
            attn_mask_type=self.attn_mask_type,
            scaling_factor=self.scale_factor,
            dropout_probability=dropout,
            is_training=not deterministic,
            window_size=self.window_size,
            context_parallel_strategy=cp,
            context_parallel_axis=self.context_parallel_axis,
            qkv_quantizers=qkv_quantizers,
            softmax_type=stype,
            softmax_offset=softmax_offset)
        b, s, h, d = out.shape
        return out.reshape(b, s, h * d)


class _FP8MHAOutProj(TransformerEngineBase):
    """fp8_mha fused attention + output projection (reference: recipe
    fp8_mha, dot_product_attention.py:106-134 + fused_attn_fp8.cu).

    Owns the SAME ``kernel`` param and ``dense`` quantizer-set names a
    ``DenseGeneral(name="out")`` would, so checkpoints and quantize_meta
    interop whether the flag is on or off. The flash epilogue quantizes
    O (delayed scaling: in-kernel cast with the pre-known scale; current
    scaling: one post-kernel pass), the projection fwd GEMM and wgrad
    consume the fp8 O payload, and the flash bwd kernels stream fp8 dO."""

    hidden_size: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, q, k, v, *, sequence_descriptor=None,
                 attn_mask_type, scaling_factor=None, window_size=None,
                 softmax_type=None, softmax_offset=None):
        from ..ops.flash_attention import flash_attention
        from ..quantize.dtypes import float8_e4m3
        from ..quantize.quantizer import (CurrentScaleQuantizer,
                                          QuantizeLayout)
        from ..quantize.scaling_modes import ScalingMode
        d_in = q.shape[2] * q.shape[3]
        kernel = self.kernel_param(
            "kernel", self.kernel_init, (sh.W_TP_AXES, sh.W_FSDP_AXES),
            (d_in, self.hidden_size), self.dtype)
        pset = self.quantizer_set("dense")       # w (kernel) + g (dgrad)
        oset = self.quantizer_set("fp8_mha_o")   # o (x) + do (dgrad)
        mk = lambda: CurrentScaleQuantizer(
            scaling_mode=ScalingMode.CURRENT_TENSOR_SCALING,
            q_layout=QuantizeLayout.ROWWISE,
            q_dtype=jnp.dtype(float8_e4m3))
        quantizers = (mk(), mk(), mk(), oset.x, pset.kernel, pset.dgrad,
                      oset.dgrad)
        return flash_attention(
            q, k, v, sequence_descriptor,
            attn_mask_type=attn_mask_type,
            scaling_factor=scaling_factor,
            window_size=window_size,
            softmax_type=softmax_type,
            softmax_offset=softmax_offset,
            mha_proj=(kernel, quantizers))


def _fp8_mha_active(recipe, *, bias, dropout, cp_axis, lora, use_bias,
                    score_mod_like) -> bool:
    """fp8_mha fast-path conditions (mirrors the fp8_dpa gating)."""
    return (getattr(recipe, "fp8_mha", False)
            and getattr(recipe, "fp8_dpa", False)
            and bias is None and dropout == 0.0 and not cp_axis
            and not lora and not use_bias and not score_mod_like)


class MultiHeadAttention(TransformerEngineBase):
    """Full attention sublayer: norm -> QKV projection -> RoPE -> core
    attention -> output projection
    (reference: jax/flax/transformer.py:1069)."""

    hidden_size: int
    num_attention_heads: int
    head_dim: Optional[int] = None
    num_gqa_groups: Optional[int] = None
    layernorm_epsilon: float = 1e-6
    norm_type: str = "layernorm"
    zero_centered_gamma: bool = False
    use_bias: bool = False
    attn_mask_type: AttnMaskType = AttnMaskType.CAUSAL
    attn_bias_type: AttnBiasType = AttnBiasType.NO_BIAS
    attention_dropout: float = 0.0
    window_size: Optional[Tuple[int, int]] = None
    softmax_type: Any = None         # attention.SoftmaxType (sink types)
    enable_rotary_pos_emb: bool = False
    rotary_pos_emb_base: float = 10000.0
    max_seq_len: int = 8192
    input_layernorm: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    context_parallel_axis: str = ""
    enable_low_rank_adaptation: bool = False
    low_rank_adaptation_dim: int = 32
    low_rank_adaptation_alpha: Optional[float] = None
    dtype: Any = jnp.bfloat16

    @property
    def _lora_kw(self):
        return dict(
            enable_low_rank_adaptation=self.enable_low_rank_adaptation,
            low_rank_adaptation_dim=self.low_rank_adaptation_dim,
            low_rank_adaptation_alpha=self.low_rank_adaptation_alpha)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                        # (B, S, H)
        kv_source: Optional[jax.Array] = None,
        sequence_descriptor: Optional[SequenceDescriptor] = None,
        bias: Optional[jax.Array] = None,
        positions: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        inference_params=None,               # inference.InferenceParams
    ) -> jax.Array:
        d = self.head_dim or self.hidden_size // self.num_attention_heads
        hq = self.num_attention_heads
        hkv = self.num_gqa_groups or hq
        from ..attention import SoftmaxType
        stype = self.softmax_type or SoftmaxType.VANILLA
        # The learnable sink lives in MHA scope so training (DPA) and
        # cached inference (flash prefill / decode kernel) share it.
        soffset = None
        if stype is SoftmaxType.LEARNABLE:
            soffset = self.param("softmax_offset", nn.initializers.zeros,
                                 (hq,), jnp.float32)
        is_self_attn = kv_source is None
        qkv_axes = (sh.W_FSDP_AXES, sh.W_TP_AXES)
        in_axes = (sh.BATCH_AXES, sh.SEQLEN_AXES, sh.HIDDEN_AXES)

        if is_self_attn:
            proj = LayerNormDenseGeneral(
                features=(hq + 2 * hkv) * d,
                epsilon=self.layernorm_epsilon,
                norm_type=self.norm_type,
                zero_centered_gamma=self.zero_centered_gamma,
                use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                kernel_axes=qkv_axes,
                input_axes=in_axes,
                dtype=self.dtype,
                **self._lora_kw,
                name="qkv") if self.input_layernorm else DenseGeneral(
                    features=(hq + 2 * hkv) * d, use_bias=self.use_bias,
                    kernel_init=self.kernel_init, kernel_axes=qkv_axes,
                    input_axes=in_axes, dtype=self.dtype, **self._lora_kw,
                    name="qkv")
            qkv = proj(x)
            b, s = qkv.shape[0], qkv.shape[1]
            q, k, v = jnp.split(qkv, [hq * d, (hq + hkv) * d], axis=-1)
            q = q.reshape(b, s, hq, d)
            k = k.reshape(b, s, hkv, d)
            v = v.reshape(b, s, hkv, d)
        else:
            q_proj = LayerNormDenseGeneral(
                features=hq * d, epsilon=self.layernorm_epsilon,
                norm_type=self.norm_type,
                zero_centered_gamma=self.zero_centered_gamma,
                use_bias=self.use_bias, kernel_init=self.kernel_init,
                kernel_axes=qkv_axes, input_axes=in_axes, dtype=self.dtype,
                **self._lora_kw, name="query")
            kv_proj = DenseGeneral(
                features=2 * hkv * d, use_bias=self.use_bias,
                kernel_init=self.kernel_init, kernel_axes=qkv_axes,
                dtype=self.dtype, **self._lora_kw, name="kv")
            q = q_proj(x)
            kv = kv_proj(kv_source)
            b, sq = q.shape[0], q.shape[1]
            skv = kv.shape[1]
            q = q.reshape(b, sq, hq, d)
            k, v = jnp.split(kv, 2, axis=-1)
            k = k.reshape(b, skv, hkv, d)
            v = v.reshape(b, skv, hkv, d)

        if inference_params is not None and positions is None:
            # Positions continue from the cache fill level.
            prev = self.get_variable("cache", "cache_length") \
                if self.has_variable("cache", "cache_length") else None
            if prev is not None:
                positions = prev[:, None] + jnp.arange(q.shape[1])[None, :]

        if self.enable_rotary_pos_emb:
            freqs = rope_frequencies(d, self.max_seq_len,
                                     base=self.rotary_pos_emb_base)
            q = apply_rope(q, freqs, positions=positions)
            k = apply_rope(k, freqs, positions=positions)

        if inference_params is not None:
            out_ctx = self._cached_attention(
                q, k, v, inference_params, sequence_descriptor,
                softmax_type=stype, softmax_offset=soffset)
            return DenseGeneral(
                features=self.hidden_size, use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                kernel_axes=(sh.W_TP_AXES, sh.W_FSDP_AXES),
                dtype=self.dtype, **self._lora_kw, name="out")(out_ctx)

        q = nn.with_logical_constraint(
            q, (sh.BATCH_AXES, sh.SEQLEN_AXES, sh.HEAD_AXES, sh.HIDDEN_AXES))
        k = nn.with_logical_constraint(
            k, (sh.BATCH_AXES, sh.SEQLEN_AXES, sh.HEAD_AXES, sh.HIDDEN_AXES))
        v = nn.with_logical_constraint(
            v, (sh.BATCH_AXES, sh.SEQLEN_AXES, sh.HEAD_AXES, sh.HIDDEN_AXES))

        # fp8_mha: fused flash + output projection, fp8 O/dO payloads
        # (reference: recipe fp8_mha; fused_attn_fp8.cu). Falls through
        # to the regular DPA + DenseGeneral path when inapplicable.
        from ..common.recipe import DelayedScaling, Float8CurrentScaling
        from ..quantize.helper import get_quantize_config
        qcfg = get_quantize_config()
        if (qcfg.enabled
                and isinstance(qcfg.recipe,
                               (DelayedScaling, Float8CurrentScaling))
                and _fp8_mha_active(
                    qcfg.recipe, bias=bias,
                    dropout=(0.0 if deterministic
                             else self.attention_dropout),
                    cp_axis=self.context_parallel_axis,
                    lora=self.enable_low_rank_adaptation,
                    use_bias=self.use_bias,
                    score_mod_like=(
                        self.attn_bias_type is AttnBiasType.ALIBI))):
            return _FP8MHAOutProj(
                hidden_size=self.hidden_size,
                kernel_init=self.kernel_init,
                dtype=self.dtype, name="out")(
                    q, k, v,
                    sequence_descriptor=sequence_descriptor,
                    attn_mask_type=self.attn_mask_type,
                    scaling_factor=getattr(self, "scale_factor", None),
                    window_size=self.window_size,
                    softmax_type=(stype if stype is not SoftmaxType.VANILLA
                                  else None),
                    softmax_offset=soffset)

        ctx = DotProductAttention(
            head_dim=d, num_attention_heads=hq, num_gqa_groups=hkv,
            attn_mask_type=self.attn_mask_type,
            attn_bias_type=self.attn_bias_type,
            attention_dropout=self.attention_dropout,
            window_size=self.window_size,
            context_parallel_axis=self.context_parallel_axis,
            softmax_type=self.softmax_type,
            name="core_attention")(
                q, k, v, sequence_descriptor, bias,
                deterministic=deterministic, softmax_offset=soffset)

        out = DenseGeneral(
            features=self.hidden_size,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            kernel_axes=(sh.W_TP_AXES, sh.W_FSDP_AXES),
            input_axes=(sh.BATCH_AXES, sh.SEQLEN_AXES, sh.HIDDEN_TP_AXES),
            dtype=self.dtype,
            **self._lora_kw,
            name="out")(ctx)
        return out

    def _cached_attention(self, q, k, v, inference_params,
                          sequence_descriptor, softmax_type=None,
                          softmax_offset=None):
        """Prefill/decode through the KV cache ("cache" collection;
        reference: pytorch/attention/inference.py KVCacheManager.step)."""
        from ..attention import SoftmaxType
        stype = softmax_type or SoftmaxType.VANILLA
        sink = None
        if stype is SoftmaxType.OFF_BY_ONE:
            sink = jnp.zeros((q.shape[2],), jnp.float32)
        elif stype is SoftmaxType.LEARNABLE:
            sink = softmax_offset
        from ..inference.kv_cache import (
            cache_append, cache_append_bhsd, calibrate_kv_scale)
        from ..ops.decode_attention import decode_attention
        from ..ops.flash_attention import flash_attention

        b, s, hkv, d = k.shape
        ip = inference_params
        assert b == ip.max_batch_size, (
            f"batch {b} != InferenceParams.max_batch_size "
            f"{ip.max_batch_size}")
        cache_dtype = ip.kv_cache_dtype
        if ip.is_paged:
            return self._paged_cached_attention(
                q, k, v, ip, sequence_descriptor, stype, sink)
        # Cache layout (TE_TPU_KV_LAYOUT): "bshd" (default) keeps the
        # (Hkv, D) minor dims as native (8, 128) tiles — the decode
        # einsums consume exactly the layout the scatter append writes,
        # so XLA inserts no per-step relayout copies of the cache.
        # "bhsd" is the r2/r3 layout (the Pallas decode kernel's).
        # 128-aligned S either way (no whole-cache pad copy).
        import os as _os
        layout = _os.environ.get("TE_TPU_KV_LAYOUT", "bshd").lower()
        s_alloc = -(-ip.max_sequence_length // 128) * 128
        cshape = ((b, s_alloc, hkv, d) if layout == "bshd"
                  else (b, hkv, s_alloc, d))
        ck = self.variable(
            "cache", "cached_key", jnp.zeros, cshape, cache_dtype)
        cv = self.variable(
            "cache", "cached_value", jnp.zeros, cshape, cache_dtype)
        clen = self.variable(
            "cache", "cache_length", jnp.zeros, (b,), jnp.int32)
        # Per-SLOT scales (B,): continuous-batching admission calibrates
        # each request's prefill amax into its own slot lane; whole-batch
        # generate gets per-row scales for free (reference:
        # inference.py:403 per-cache-manager recalibration).
        kv_scale = self.variable(
            "cache", "kv_scale", jnp.ones, (b,), jnp.float32)

        is_prefill = s > 1
        if is_prefill and ip.is_fp8:
            kv_scale.value = (
                jnp.full((b,), ip.fixed_kv_scale, jnp.float32)
                if ip.fixed_kv_scale is not None
                else calibrate_kv_scale(k, v, per_slot=True))
        qscale = kv_scale.value if ip.is_fp8 else None
        append = cache_append if layout == "bshd" else cache_append_bhsd
        new_k, new_v, new_len = append(
            ck.value, cv.value, clen.value, k, v, qscale)
        ck.value, cv.value, clen.value = new_k, new_v, new_len

        window = self.window_size
        if is_prefill:
            # Prompt attends to itself causally (cache was empty before).
            seqlens = (sequence_descriptor.q_seqlens
                       if sequence_descriptor is not None
                       and sequence_descriptor.q_seqlens is not None else None)
            desc = (SequenceDescriptor.from_seqlens(seqlens)
                    if seqlens is not None else None)
            out = flash_attention(
                q, k, v, desc,
                attn_mask_type=(AttnMaskType.PADDING_CAUSAL if desc is not None
                                else AttnMaskType.CAUSAL),
                scaling_factor=self.scale_factor if hasattr(self, "scale_factor")
                else None,
                window_size=window,
                softmax_type=(stype if stype is not SoftmaxType.VANILLA
                              else None),
                softmax_offset=sink)
        else:
            dq_scale = (1.0 / kv_scale.value) if ip.is_fp8 else None
            out = decode_attention(
                q, ck.value, cv.value, clen.value,
                kv_scale=dq_scale,
                window_left=window[0] if window is not None else -1,
                kv_layout="BSHD" if layout == "bshd" else "BHSD",
                softmax_sink=sink)
        bq, sq, hq, dd = out.shape
        return out.reshape(bq, sq, hq * dd)

    def _paged_cached_attention(self, q, k, v, ip, sequence_descriptor,
                                stype=None, sink=None):
        """Paged-cache collection path (reference: PagedKVCacheManager,
        pytorch/attention/inference.py:591): the page pool, page table,
        lengths, and free-list all live in the "cache" collection, and
        decode reads pages through the scalar-prefetch Pallas kernel."""
        from ..attention import SoftmaxType
        stype = stype or SoftmaxType.VANILLA
        from ..inference.kv_cache import (
            PagedKVState, calibrate_kv_scale, paged_append_prompt,
            paged_append_token)
        from ..ops.flash_attention import flash_attention
        from ..ops.paged_attention import paged_decode_attention

        b, s, hkv, d = k.shape
        page = ip.page_size
        mpps = -(-ip.max_sequence_length // page)     # pages per sequence
        num_pages = b * mpps
        cache_dtype = ip.kv_cache_dtype
        pk = self.variable("cache", "pages_k", jnp.zeros,
                           (num_pages, page, hkv, d), cache_dtype)
        pv = self.variable("cache", "pages_v", jnp.zeros,
                           (num_pages, page, hkv, d), cache_dtype)
        pt = self.variable("cache", "page_table",
                           lambda: jnp.full((b, mpps), -1, jnp.int32))
        clen = self.variable("cache", "cache_length", jnp.zeros, (b,),
                             jnp.int32)
        free = self.variable("cache", "free_head", jnp.zeros, (),
                             jnp.int32)
        # Per-slot (B,) scales — same contract as the non-paged cache
        # (continuous batching admits per-request calibrations).
        kv_scale = self.variable("cache", "kv_scale", jnp.ones, (b,),
                                 jnp.float32)

        is_prefill = s > 1
        if is_prefill and ip.is_fp8:
            kv_scale.value = (
                jnp.full((b,), ip.fixed_kv_scale, jnp.float32)
                if ip.fixed_kv_scale is not None
                else calibrate_kv_scale(k, v, per_slot=True))
        qscale = kv_scale.value if ip.is_fp8 else None
        state = PagedKVState(pages_k=pk.value, pages_v=pv.value,
                             page_table=pt.value, lengths=clen.value,
                             free_head=free.value)
        if is_prefill:
            state = paged_append_prompt(state, k, v, qscale)
        else:
            state = paged_append_token(state, k, v, qscale)
        pk.value, pv.value = state.pages_k, state.pages_v
        pt.value, clen.value = state.page_table, state.lengths
        free.value = state.free_head

        if is_prefill:
            seqlens = (sequence_descriptor.q_seqlens
                       if sequence_descriptor is not None
                       and sequence_descriptor.q_seqlens is not None
                       else None)
            desc = (SequenceDescriptor.from_seqlens(seqlens)
                    if seqlens is not None else None)
            out = flash_attention(
                q, k, v, desc,
                attn_mask_type=(AttnMaskType.PADDING_CAUSAL
                                if desc is not None else
                                AttnMaskType.CAUSAL),
                softmax_type=(stype if stype is not SoftmaxType.VANILLA
                              else None),
                softmax_offset=sink)
        else:
            dq_scale = (1.0 / kv_scale.value) if ip.is_fp8 else None
            out = paged_decode_attention(
                q, state.pages_k, state.pages_v, state.page_table,
                state.lengths, kv_scale=dq_scale, softmax_sink=sink)
        bq, sq, hq, dd = out.shape
        return out.reshape(bq, sq, hq * dd)


class TransformerLayerType(enum.Enum):
    """(reference: jax/flax/transformer.py TransformerLayerType)"""
    ENCODER = "encoder"
    DECODER = "decoder"


class TransformerLayer(TransformerEngineBase):
    """Encoder/decoder transformer layer (reference:
    pytorch/transformer.py:70; jax/flax/transformer.py:1847).
    ``layer_type`` takes the string or :class:`TransformerLayerType`."""

    hidden_size: int = 512
    mlp_hidden_size: int = 2048
    num_attention_heads: int = 8
    head_dim: Optional[int] = None
    num_gqa_groups: Optional[int] = None
    layernorm_epsilon: float = 1e-6
    norm_type: str = "rmsnorm"
    zero_centered_gamma: bool = False
    hidden_dropout: float = 0.0
    attention_dropout: float = 0.0
    mlp_activations: Union[str, Sequence[str]] = ("gelu",)
    use_bias: bool = False
    self_attn_mask_type: AttnMaskType = AttnMaskType.CAUSAL
    window_size: Optional[Tuple[int, int]] = None
    softmax_type: Any = None         # attention.SoftmaxType (sink types)
    layer_type: str = "encoder"      # "encoder" | "decoder" (adds cross-attn)
    enable_rotary_pos_emb: bool = False
    rotary_pos_emb_base: float = 10000.0
    max_seq_len: int = 8192
    output_layernorm: bool = False
    drop_path: float = 0.0
    context_parallel_axis: str = ""
    # MoE: >0 replaces the dense MLP with a top-k routed expert MLP
    # (MoELayerNormMLP); aux loss is sown into "intermediates".
    num_moe_experts: int = 0
    moe_topk: int = 2
    moe_score_function: str = "softmax"
    moe_aux_loss_coeff: float = 1e-2
    moe_ep_axis: str = ""            # set when running under shard_map EP
    moe_dropless: bool = True
    moe_capacity_factor: float = 2.0
    enable_relative_embedding: bool = False
    relative_embedding_buckets: int = 32
    relative_embedding_max_distance: int = 128
    enable_low_rank_adaptation: bool = False
    low_rank_adaptation_dim: int = 32
    low_rank_adaptation_alpha: Optional[float] = None
    dtype: Any = jnp.bfloat16

    def _drop_path(self, branch: jax.Array, deterministic: bool) -> jax.Array:
        """Stochastic depth on a residual branch (reference:
        pytorch/transformer.py drop_path): drop the whole branch per
        sample with prob ``drop_path``, rescale survivors by 1/keep."""
        if self.drop_path <= 0.0 or deterministic:
            return branch
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        shape = (branch.shape[0],) + (1,) * (branch.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, branch / keep, 0.0).astype(branch.dtype)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        encoded: Optional[jax.Array] = None,
        sequence_descriptor: Optional[SequenceDescriptor] = None,
        positions: Optional[jax.Array] = None,
        deterministic: bool = True,
        inference_params=None,
    ) -> jax.Array:
        attn_bias = None
        attn_bias_type = AttnBiasType.NO_BIAS
        if self.enable_relative_embedding and inference_params is None:
            # T5-style trained bias on the self-attention logits
            # (reference: jax/flax/transformer.py:1847 TransformerLayer
            # relative_embedding); causal masks are unidirectional.
            bidirectional = "causal" not in self.self_attn_mask_type.value
            attn_bias = RelativePositionBiases(
                num_buckets=self.relative_embedding_buckets,
                max_distance=self.relative_embedding_max_distance,
                num_attention_heads=self.num_attention_heads,
                name="relpos_bias")(x.shape[1], x.shape[1], bidirectional)
            attn_bias_type = AttnBiasType.POST_SCALE_BIAS
        attn_out = MultiHeadAttention(
            hidden_size=self.hidden_size,
            num_attention_heads=self.num_attention_heads,
            head_dim=self.head_dim,
            num_gqa_groups=self.num_gqa_groups,
            layernorm_epsilon=self.layernorm_epsilon,
            norm_type=self.norm_type,
            zero_centered_gamma=self.zero_centered_gamma,
            use_bias=self.use_bias,
            attn_mask_type=self.self_attn_mask_type,
            attn_bias_type=attn_bias_type,
            attention_dropout=self.attention_dropout,
            window_size=self.window_size,
            softmax_type=self.softmax_type,
            enable_rotary_pos_emb=self.enable_rotary_pos_emb,
            rotary_pos_emb_base=self.rotary_pos_emb_base,
            max_seq_len=self.max_seq_len,
            context_parallel_axis=self.context_parallel_axis,
            enable_low_rank_adaptation=self.enable_low_rank_adaptation,
            low_rank_adaptation_dim=self.low_rank_adaptation_dim,
            low_rank_adaptation_alpha=self.low_rank_adaptation_alpha,
            dtype=self.dtype,
            name="self_attention")(
                x, None, sequence_descriptor, bias=attn_bias,
                positions=positions, deterministic=deterministic,
                inference_params=inference_params)
        if self.hidden_dropout > 0.0 and not deterministic:
            attn_out = nn.Dropout(rate=self.hidden_dropout)(
                attn_out, deterministic=deterministic)
        x = x + self._drop_path(attn_out, deterministic)

        layer_type = getattr(self.layer_type, "value", self.layer_type)
        if layer_type == "decoder" and encoded is not None:
            cross = MultiHeadAttention(
                hidden_size=self.hidden_size,
                num_attention_heads=self.num_attention_heads,
                head_dim=self.head_dim,
                num_gqa_groups=self.num_gqa_groups,
                layernorm_epsilon=self.layernorm_epsilon,
                norm_type=self.norm_type,
                zero_centered_gamma=self.zero_centered_gamma,
                use_bias=self.use_bias,
                attn_mask_type=AttnMaskType.PADDING,
                attention_dropout=self.attention_dropout,
                enable_low_rank_adaptation=self.enable_low_rank_adaptation,
                low_rank_adaptation_dim=self.low_rank_adaptation_dim,
                low_rank_adaptation_alpha=self.low_rank_adaptation_alpha,
                dtype=self.dtype,
                name="inter_attention")(
                    x, encoded, sequence_descriptor,
                    deterministic=deterministic)
            if self.hidden_dropout > 0.0 and not deterministic:
                cross = nn.Dropout(rate=self.hidden_dropout)(
                    cross, deterministic=deterministic)
            x = x + cross

        if self.num_moe_experts > 0:
            from .moe import MoELayerNormMLP
            mlp_out = MoELayerNormMLP(
                num_experts=self.num_moe_experts,
                topk=self.moe_topk,
                intermediate_dim=self.mlp_hidden_size,
                epsilon=self.layernorm_epsilon,
                norm_type=self.norm_type,
                zero_centered_gamma=self.zero_centered_gamma,
                activations=self.mlp_activations,
                score_function=self.moe_score_function,
                aux_loss_coeff=self.moe_aux_loss_coeff,
                ep_axis=self.moe_ep_axis,
                dropless=self.moe_dropless,
                capacity_factor=self.moe_capacity_factor,
                dtype=self.dtype,
                name="mlp")(x, deterministic=deterministic)
        else:
            mlp_out = LayerNormMLP(
                intermediate_dim=self.mlp_hidden_size,
                epsilon=self.layernorm_epsilon,
                norm_type=self.norm_type,
                zero_centered_gamma=self.zero_centered_gamma,
                use_bias=self.use_bias,
                activations=self.mlp_activations,
                input_axes=(sh.BATCH_AXES, sh.SEQLEN_AXES, sh.HIDDEN_AXES),
                intermediate_axes=(sh.BATCH_AXES, sh.SEQLEN_AXES,
                                   sh.JOINED_AXES, sh.HIDDEN_TP_AXES),
                enable_low_rank_adaptation=self.enable_low_rank_adaptation,
                low_rank_adaptation_dim=self.low_rank_adaptation_dim,
                low_rank_adaptation_alpha=self.low_rank_adaptation_alpha,
                dtype=self.dtype,
                name="mlp")(x, deterministic=deterministic)
        if self.hidden_dropout > 0.0 and not deterministic:
            mlp_out = nn.Dropout(rate=self.hidden_dropout)(
                mlp_out, deterministic=deterministic)
        x = x + self._drop_path(mlp_out, deterministic)

        if self.output_layernorm:
            x = LayerNorm(
                epsilon=self.layernorm_epsilon, norm_type=self.norm_type,
                zero_centered_gamma=self.zero_centered_gamma,
                name="output_layernorm")(x)
        return x
