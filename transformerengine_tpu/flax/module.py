"""Flax (linen) modules over the functional quantized layers.

TPU counterpart of the reference Flax module zoo (reference:
jax/flax/module.py — DenseGeneral :421, LayerNormDenseGeneral :590,
LayerNormMLP :879, LayerNorm :251). Quantizer state for stateful
recipes (DelayedScaling) lives in the ``quantize_meta`` collection and
follows the overwrite-with-gradient convention: take grads w.r.t. that
collection and the "gradient" IS the updated state (see
``update_quantize_meta``) — the same pattern the reference's JAX side
uses for fp8 metas.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dense import dense
from ..layernorm import layernorm as layernorm_fn
from ..layernorm_dense import layernorm_dense
from ..layernorm_mlp import layernorm_mlp
from ..ops.activation import normalize_activation_type
from ..parallel import sharding as sh
from ..quantize.helper import QuantizerFactory, get_quantize_config
from ..quantize.quantizer import (
    DelayedScaleQuantizer, QuantizerSet, noop_quantizer_set)

QUANTIZE_META = "quantize_meta"
KERNEL_CACHE = "kernel_cache"
Initializer = Callable[..., jax.Array]


def _maybe_partition(init, axes):
    if axes:
        return nn.with_logical_partitioning(init, axes)
    return init


def _lora_delta(x, a_kernel, b_kernel, alpha):
    """Low-rank adaptation delta ``scaling * ((x @ A) @ B)`` (reference:
    jax/flax/module.py:137 _apply_low_rank_adaptation). ``A`` has shape
    (in, *feat[:-1], rank), ``B`` (*feat[:-1], rank, feat_last); the
    delta runs in the input dtype (high precision — LoRA adapters are
    never quantized, matching the reference)."""
    rank = a_kernel.shape[-1]
    scaling = (alpha / rank) if alpha is not None else 1.0
    n_mid = a_kernel.ndim - 2   # len(features) - 1
    mid = "nopqr"[:n_mid]
    expr = (f"...i,i{mid}s,{mid}sj->...{mid}j")
    return jnp.einsum(expr, x, a_kernel, b_kernel) * scaling


def _lora_params(module: nn.Module, name: str, in_dim: int,
                 features: Tuple[int, ...], kernel_init, dtype):
    """Create the (A, B) adapter pair. A is kernel-initialized, B
    zero-initialized so the adapted module starts exactly at the base
    model (reference: jax/flax/module.py:555-577)."""
    rank = module.low_rank_adaptation_dim
    a = module.param(f"{name}lora_a_kernel", kernel_init,
                     (in_dim, *features[:-1], rank), dtype)
    b = module.param(f"{name}lora_b_kernel", nn.initializers.zeros,
                     (*features[:-1], rank, features[-1]), dtype)
    return a, b


class TransformerEngineBase(nn.Module):
    """Shared quantizer-state plumbing for all TE Flax modules."""

    def kernel_param(self, name, init, axes, shape, dtype):
        """Fetch a projection kernel: the ``prequant`` collection (FP8-
        resident inference weights, quantize/prequant.py) takes priority
        over a live param."""
        if self.has_variable("prequant", name):
            return self.get_variable("prequant", name)
        return self.param(name, _maybe_partition(init, axes), shape, dtype)

    def kernel_cache(self, name: str, kernel, qset: QuantizerSet,
                     n_cdims: int = 1):
        """Microbatch weight-quantization cache — the Flax-native
        ``is_first_microbatch`` (reference: pytorch/module/base.py:744
        FP8 weight workspace). First microbatch of a grad-accumulation
        step: apply with ``mutable=["kernel_cache"]`` — the kernel is
        quantized once and stored in the collection. Later microbatches:
        feed the collection back in the variables dict — the stored
        quantized usages are reused and the per-call kernel quantize is
        skipped. Without the collection this is a no-op (returns None).

        The build microbatch itself uses the cache too (one weight
        quantize per step); with DelayedScaling the cache-time weight
        amax rides the cache and is observed into the quantize_meta
        cotangent by every microbatch's bwd (idempotent — see
        quantize/microbatch.py).

        STALENESS: the cache holds the weights quantized at build time
        and is NOT revalidated (the reference's quantize_weight
        revalidates per call). Drop/rebuild the collection after every
        optimizer step — i.e. run the first microbatch of each step
        with ``mutable=["kernel_cache"]`` and never feed a previous
        step's collection back — or the layer silently computes with
        stale quantized weights."""
        from ..quantize.prequant import PrequantizedKernel
        if (isinstance(kernel, PrequantizedKernel) or qset.x is None
                or self.is_initializing()):
            # is_initializing: init() makes every collection mutable; a
            # cache built from init-time weights would silently go stale
            # after the first optimizer step.
            return None
        if self.has_variable(KERNEL_CACHE, name) and \
                not self.is_mutable_collection(KERNEL_CACHE):
            return self.get_variable(KERNEL_CACHE, name)
        if self.is_mutable_collection(KERNEL_CACHE):
            from ..quantize.microbatch import quantize_kernel
            cache, _ = quantize_kernel(kernel, qset, n_cdims)
            self.put_variable(KERNEL_CACHE, name, cache)
            return cache
        return None

    def quantizer_set(self, name: str, recipe=None) -> QuantizerSet:
        """QuantizerSet for one GEMM, with delayed-scaling state backed
        by the quantize_meta collection. ``recipe`` overrides the
        ambient autocast recipe (explicit-recipe integration shims)."""
        cfg = get_quantize_config()
        from ..debug.api import get_state, wrap_quantizer_set
        debug_on = get_state().enabled
        if recipe is None and not cfg.enabled and not debug_on:
            return noop_quantizer_set
        if recipe is not None:
            qset = QuantizerFactory.create_set(recipe)
        else:
            qset = (QuantizerFactory.create_set(cfg.recipe) if cfg.enabled
                    else noop_quantizer_set)
        # Stateful (delayed-scaling) quantizers: back their arrays with
        # flax variables so state persists across steps.
        out = {}
        for role in ("x", "kernel", "dgrad"):
            q = getattr(qset, role)
            if isinstance(q, DelayedScaleQuantizer):
                scale = self.variable(
                    QUANTIZE_META, f"{name}_{role}_scale",
                    lambda: jnp.ones((1,), jnp.float32))
                hist = self.variable(
                    QUANTIZE_META, f"{name}_{role}_amax_history",
                    lambda: jnp.zeros_like(q.amax_history))
                import dataclasses
                q = dataclasses.replace(
                    q, scale=scale.value, amax_history=hist.value)
            out[role] = q
        result = QuantizerSet(**out)
        if debug_on:
            try:
                layer_name = "/".join(str(p) for p in self.path) or name
            except Exception:
                layer_name = name
            result = wrap_quantizer_set(result, f"{layer_name}/{name}")
        return result


def wrap_function_in_te_state_module(f, quantization_recipe,
                                     name: Optional[str] = None,
                                     quantization_checkpoint_name=None):
    """Wrap function ``f`` in a linen module that supplies it a
    ``generate_quantizer_set`` first argument (reference:
    jax/flax/module.py:1364). The module holds no parameters; stateful
    recipes (DelayedScaling) get their scale/amax-history variables in
    the ``quantize_meta`` collection, same as every TE module. Intended
    for dropping TE quantization into existing model code that manages
    its own weights."""
    del quantization_checkpoint_name   # checkpointing is orbax-native here
    fname = name or getattr(f, "__name__", "te_wrapped_fn")

    class _TEStateModule(TransformerEngineBase):
        @nn.compact
        def __call__(self, *args, **kwargs):
            counter = [0]

            def generate_quantizer_set(n_groups=None):
                del n_groups   # grouped GEMMs share the per-set scales
                idx = counter[0]
                counter[0] += 1
                return self.quantizer_set(f"{fname}_q{idx}",
                                          recipe=quantization_recipe)

            return f(generate_quantizer_set, *args, **kwargs)

    _TEStateModule.__name__ = fname
    return _TEStateModule


def make_dot_general_cls(quantization_recipe):
    """Drop-in ``dot_general`` replacement running TE's quantized GEMM
    (reference: jax/flax/module.py:1411):

        dense = nn.Dense(..., dot_general=make_dot_general_cls(recipe)())

    Stateless recipes only (current scaling / MXFP8 / blockwise / NVFP4)
    — a bare dot_general callable has no flax scope to hold
    DelayedScaling's amax history; use DenseGeneral or
    :func:`wrap_function_in_te_state_module` for that."""
    from ..common.recipe import DelayedScaling
    if isinstance(quantization_recipe, DelayedScaling):
        raise NotImplementedError(
            "make_dot_general_cls cannot hold DelayedScaling state in a "
            "bare dot_general; use DenseGeneral or "
            "wrap_function_in_te_state_module")

    class TEDotGeneral:
        def __call__(self, lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
            (lc, rc), (lb, rb) = dimension_numbers
            assert not lb and not rb, (
                "TE dot_general does not take batch dims")
            assert tuple(lc) == (lhs.ndim - 1,) and tuple(rc) == (0,), (
                f"TE dot_general expects (last, 0) contraction, got "
                f"{dimension_numbers}")
            from ..dense import dense
            qset = QuantizerFactory.create_set(quantization_recipe)
            return dense(lhs, rhs, quantizer_set=qset)

    return TEDotGeneral


def make_grouped_dense_cls(quantization_recipe,
                           quantization_checkpoint_name=None):
    """Grouped-GEMM analog of :func:`make_dot_general_cls`, packaged as
    a TE state module (reference: jax/flax/module.py:1455). The wrapped
    callable signature is (x, kernel, group_sizes)."""

    def te_grouped_dot_general(generate_quantizer_set, x, kernel,
                               group_sizes, **kwargs):
        del kwargs
        from ..grouped_dense import grouped_dense
        qset = generate_quantizer_set(n_groups=group_sizes.shape[0])
        return grouped_dense(x, kernel, group_sizes, quantizer_set=qset)

    return wrap_function_in_te_state_module(
        te_grouped_dot_general, quantization_recipe,
        name="te_grouped_dense",
        quantization_checkpoint_name=quantization_checkpoint_name)


def update_quantize_meta(variables: dict, grads: dict) -> dict:
    """Overwrite-with-gradient state update: replace the quantize_meta
    collection with its 'gradients' (the updated quantizer state emitted
    by the custom-VJP bwd rules)."""
    new = dict(variables)
    if QUANTIZE_META in grads:
        new[QUANTIZE_META] = grads[QUANTIZE_META]
    return new


class LayerNorm(nn.Module):
    """(reference: jax/flax/module.py:251)"""

    epsilon: float = 1e-6
    norm_type: str = "layernorm"
    zero_centered_gamma: bool = False
    scale_init: Optional[Initializer] = None
    bias_init: Initializer = nn.initializers.zeros
    scale_axes: Tuple[str, ...] = (sh.W_NO_SHARD_AXES,)
    bias_axes: Tuple[str, ...] = (sh.W_NO_SHARD_AXES,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale_init = self.scale_init or (
            nn.initializers.zeros if self.zero_centered_gamma
            else nn.initializers.ones)
        h = x.shape[-1]
        gamma = self.param(
            "scale", _maybe_partition(scale_init, self.scale_axes), (h,),
            self.dtype)
        beta = None
        if self.norm_type == "layernorm":
            beta = self.param(
                "ln_bias", _maybe_partition(self.bias_init, self.bias_axes),
                (h,), self.dtype)
        return layernorm_fn(x, gamma, beta, self.norm_type,
                            self.zero_centered_gamma, self.epsilon)


class Softmax(nn.Module):
    """Softmax over (B, H, Sq, Skv) attention logits with optional
    scaling, mask fusion, and sink (off-by-one / learnable) variants
    (reference: jax/flax/module.py:164 Softmax). ``mask`` follows the
    reference convention: 1/True = masked out."""

    scale_factor: float = 1.0
    softmax_fusion_type: Any = None   # softmax.SoftmaxType; None = SCALED
    softmax_type: Any = None          # attention sink type; None = VANILLA
    offset_init: Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, inputs: jax.Array, mask: Optional[jax.Array] = None,
                 bias: Optional[jax.Array] = None,
                 softmax_offset: Optional[jax.Array] = None) -> jax.Array:
        from ..attention import SoftmaxType as SinkType
        from ..softmax import SoftmaxType as FusionType, softmax as softmax_fn
        fusion = self.softmax_fusion_type or FusionType.SCALED
        sink = self.softmax_type or SinkType.VANILLA

        logits = inputs
        if bias is not None:
            logits = logits + bias.astype(logits.dtype)
        if sink is SinkType.VANILLA:
            return softmax_fn(logits, mask, fusion, self.scale_factor)

        # Sink variants: one extra logit column absorbs probability mass
        # and is dropped after normalization (reference: off-by-one /
        # learnable softmax types).
        heads = logits.shape[1]
        if sink is SinkType.LEARNABLE and softmax_offset is None:
            softmax_offset = self.param("softmax_offset", self.offset_init,
                                        (heads,), jnp.float32)
        x = logits.astype(jnp.float32) * self.scale_factor
        if mask is not None:
            x = jnp.where(mask.astype(jnp.bool_), jnp.float32(-1e30), x)
        bshape = (*x.shape[:-1], 1)
        if sink is SinkType.LEARNABLE:
            off = softmax_offset.reshape(1, -1, 1, 1).astype(jnp.float32)
            col = jnp.broadcast_to(off, bshape)
        else:
            col = jnp.zeros(bshape, jnp.float32)
        aug = jnp.concatenate([x, col], axis=-1)
        return jax.nn.softmax(aug, axis=-1)[..., :-1].astype(inputs.dtype)


class DenseGeneral(TransformerEngineBase):
    """Quantized dense layer (reference: jax/flax/module.py:421)."""

    features: Union[int, Sequence[int]]
    use_bias: bool = True
    kernel_init: Initializer = nn.initializers.lecun_normal()
    kernel_axes: Tuple[str, ...] = ()
    bias_init: Initializer = nn.initializers.zeros
    bias_axes: Tuple[str, ...] = ()
    input_axes: Tuple[str, ...] = ()
    enable_low_rank_adaptation: bool = False
    low_rank_adaptation_dim: int = 32
    low_rank_adaptation_alpha: Optional[float] = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = (self.features,) if isinstance(self.features, int) \
            else tuple(self.features)
        kernel = self.kernel_param(
            "kernel", self.kernel_init, self.kernel_axes,
            (x.shape[-1], *features), self.dtype)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", _maybe_partition(self.bias_init, self.bias_axes),
                features, self.dtype)
        qset = self.quantizer_set("dense")
        out = dense(x, kernel, bias,
                    input_axes=self.input_axes or None,
                    kernel_axes=self.kernel_axes or None,
                    quantizer_set=qset,
                    kernel_cache=self.kernel_cache("kernel", kernel, qset))
        if self.enable_low_rank_adaptation:
            a, b = _lora_params(self, "", x.shape[-1], features,
                                self.kernel_init, self.dtype)
            out = out + _lora_delta(x, a, b, self.low_rank_adaptation_alpha
                                    ).astype(out.dtype)
        return out


class LayerNormDenseGeneral(TransformerEngineBase):
    """Fused norm + dense (reference: jax/flax/module.py:590)."""

    features: Union[int, Sequence[int]]
    epsilon: float = 1e-6
    norm_type: str = "layernorm"
    zero_centered_gamma: bool = False
    use_bias: bool = True
    return_layernorm_output: bool = False
    kernel_init: Initializer = nn.initializers.lecun_normal()
    kernel_axes: Tuple[str, ...] = ()
    bias_init: Initializer = nn.initializers.zeros
    bias_axes: Tuple[str, ...] = ()
    input_axes: Tuple[str, ...] = ()
    scale_axes: Tuple[str, ...] = (sh.W_NO_SHARD_AXES,)
    enable_low_rank_adaptation: bool = False
    low_rank_adaptation_dim: int = 32
    low_rank_adaptation_alpha: Optional[float] = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array):
        features = (self.features,) if isinstance(self.features, int) \
            else tuple(self.features)
        h = x.shape[-1]
        scale_init = (nn.initializers.zeros if self.zero_centered_gamma
                      else nn.initializers.ones)
        gamma = self.param(
            "scale", _maybe_partition(scale_init, self.scale_axes), (h,),
            jnp.float32)
        beta = None
        if self.norm_type == "layernorm":
            beta = self.param(
                "ln_bias", _maybe_partition(nn.initializers.zeros,
                                            self.scale_axes), (h,),
                jnp.float32)
        kernel = self.kernel_param(
            "kernel", self.kernel_init, self.kernel_axes,
            (h, *features), self.dtype)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", _maybe_partition(self.bias_init, self.bias_axes),
                features, self.dtype)
        assert len(features) == 1, "flatten output features before the module"
        qset = self.quantizer_set("ln_dense")
        out = layernorm_dense(
            x, kernel, gamma, beta, bias,
            norm_type=self.norm_type,
            zero_centered_gamma=self.zero_centered_gamma,
            epsilon=self.epsilon,
            input_axes=self.input_axes or None,
            kernel_axes=self.kernel_axes or None,
            quantizer_set=qset,
            kernel_cache=self.kernel_cache("kernel", kernel, qset))
        if self.enable_low_rank_adaptation:
            # The adapter consumes the normalized input (reference:
            # jax/flax/module.py:854 — LoRA is applied to `y`, the LN
            # output). The duplicate norm is bandwidth-trivial and CSEs
            # where possible.
            ln_out = layernorm_fn(x, gamma, beta, self.norm_type,
                                  self.zero_centered_gamma, self.epsilon)
            a, b = _lora_params(self, "", h, features, self.kernel_init,
                                self.dtype)
            out = out + _lora_delta(ln_out, a, b,
                                    self.low_rank_adaptation_alpha
                                    ).astype(out.dtype)
        if self.return_layernorm_output:
            ln_out = layernorm_fn(x, gamma, beta, self.norm_type,
                                  self.zero_centered_gamma, self.epsilon)
            return out, ln_out
        return out


class LayerNormMLP(TransformerEngineBase):
    """Fused norm + MLP block (reference: jax/flax/module.py:879)."""

    intermediate_dim: int = 2048
    epsilon: float = 1e-6
    norm_type: str = "layernorm"
    zero_centered_gamma: bool = False
    use_bias: bool = True
    activations: Union[str, Sequence[str]] = ("relu",)
    intermediate_dropout_rate: float = 0.0
    kernel_init: Initializer = nn.initializers.lecun_normal()
    scale_axes: Tuple[str, ...] = (sh.W_NO_SHARD_AXES,)
    kernel_axes_1: Tuple[str, ...] = (sh.W_FSDP_AXES, sh.W_JOINED_AXES,
                                      sh.W_TP_AXES)
    kernel_axes_2: Tuple[str, ...] = (sh.W_TP_AXES, sh.W_FSDP_AXES)
    input_axes: Tuple[str, ...] = ()
    intermediate_axes: Tuple[str, ...] = ()
    enable_low_rank_adaptation: bool = False
    low_rank_adaptation_dim: int = 32
    low_rank_adaptation_alpha: Optional[float] = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        acts = normalize_activation_type(self.activations)
        n_act = len(acts)
        h = x.shape[-1]
        scale_init = (nn.initializers.zeros if self.zero_centered_gamma
                      else nn.initializers.ones)
        gamma = self.param(
            "scale", _maybe_partition(scale_init, self.scale_axes), (h,),
            jnp.float32)
        beta = None
        if self.norm_type == "layernorm":
            beta = self.param(
                "ln_bias", _maybe_partition(nn.initializers.zeros,
                                            self.scale_axes), (h,),
                jnp.float32)
        kernel1 = self.kernel_param(
            "wi_kernel", self.kernel_init, self.kernel_axes_1,
            (h, n_act, self.intermediate_dim), self.dtype)
        kernel2 = self.kernel_param(
            "wo_kernel", self.kernel_init, self.kernel_axes_2,
            (self.intermediate_dim, h), self.dtype)
        bias1 = bias2 = None
        if self.use_bias:
            bias1 = self.param("wi_bias", nn.initializers.zeros,
                               (n_act, self.intermediate_dim), self.dtype)
            bias2 = self.param("wo_bias", nn.initializers.zeros, (h,),
                               self.dtype)
        needs_decomposed = (
            (self.intermediate_dropout_rate > 0.0 and not deterministic)
            or self.enable_low_rank_adaptation)
        if needs_decomposed:
            # Intermediate dropout / LoRA need the tensors between the
            # GEMMs (reference: jax/flax/module.py:879 intermediate
            # dropout, :1150 per-GEMM LoRA) — the fused custom-VJP block
            # has no hooks there, so compose the unfused path.
            from ..ops.activation import act_lu
            y = layernorm_fn(x, gamma, beta, self.norm_type,
                             self.zero_centered_gamma, self.epsilon)
            a = dense(y, kernel1.reshape(h, n_act * self.intermediate_dim),
                      bias1.reshape(-1) if bias1 is not None else None,
                      input_axes=self.input_axes or None,
                      quantizer_set=self.quantizer_set("mlp1"))
            a = a.reshape(*a.shape[:-1], n_act, self.intermediate_dim)
            if self.enable_low_rank_adaptation:
                a1, b1 = _lora_params(
                    self, "wi_", h, (n_act, self.intermediate_dim),
                    self.kernel_init, self.dtype)
                a = a + _lora_delta(y, a1, b1,
                                    self.low_rank_adaptation_alpha
                                    ).astype(a.dtype)
            act = act_lu(a, acts)
            if self.intermediate_dropout_rate > 0.0 and not deterministic:
                act = nn.Dropout(rate=self.intermediate_dropout_rate)(
                    act, deterministic=False)
            out = dense(act, kernel2, bias2,
                        quantizer_set=self.quantizer_set("mlp2"))
            if self.enable_low_rank_adaptation:
                a2, b2 = _lora_params(
                    self, "wo_", self.intermediate_dim, (h,),
                    self.kernel_init, self.dtype)
                out = out + _lora_delta(act, a2, b2,
                                        self.low_rank_adaptation_alpha
                                        ).astype(out.dtype)
            return out
        qset1 = self.quantizer_set("mlp1")
        qset2 = self.quantizer_set("mlp2")
        return layernorm_mlp(
            x, gamma, beta, kernel1, kernel2, bias1, bias2,
            norm_type=self.norm_type,
            zero_centered_gamma=self.zero_centered_gamma,
            epsilon=self.epsilon,
            activation_type=acts,
            input_axes=self.input_axes or None,
            dot1_kernel_axes=self.kernel_axes_1 or None,
            dot2_kernel_axes=self.kernel_axes_2 or None,
            intermediate_axes=self.intermediate_axes or None,
            quantizer_sets=(qset1, qset2),
            kernel_caches=(self.kernel_cache("wi_kernel", kernel1, qset1),
                           self.kernel_cache("wo_kernel", kernel2, qset2)))
