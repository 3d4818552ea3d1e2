"""Flax MoE (mixture-of-experts) MLP sublayer.

TPU counterpart of the reference MoE assembly — router + permutation +
GroupedLinear glued together by the training framework (reference:
jax/moe.py:2071 fused EP block; pytorch router/permutation/GroupedLinear
stack assembled by Megatron-style trainers). Here it is a drop-in
sibling of ``LayerNormMLP``: norm -> router -> dispatch -> grouped
expert MLP -> combine, quantized through the same QuantizerSet plumbing
(MXFP8/blockwise recipes run the block-scaled grouped GEMM path).

The auxiliary load-balancing loss is sown into the ``"intermediates"``
collection under ``moe_aux_loss``; collect it with
``nn.Module.apply(..., mutable=["intermediates"])`` and add
``sum(jax.tree.leaves(...))`` to the task loss.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..moe import moe
from ..ops.activation import normalize_activation_type
from ..parallel import sharding as sh
from .module import (LayerNorm, TransformerEngineBase, _maybe_partition)


class MoELayerNormMLP(TransformerEngineBase):
    """Norm + top-k routed mixture-of-experts MLP.

    Expert weights are stacked ``(E, H, n_act*F)`` / ``(E, F, H)`` and
    sharded on the ``nvte_expert`` logical axis; under expert
    parallelism (``ep_axis`` set, running inside ``shard_map``) tokens
    reach their experts via exact-size ragged all-to-alls (dropless) or
    fixed-capacity a2a (``dropless=False``).
    """

    num_experts: int = 8
    topk: int = 2
    intermediate_dim: int = 2048
    epsilon: float = 1e-6
    norm_type: str = "rmsnorm"
    zero_centered_gamma: bool = False
    activations: Union[str, Sequence[str]] = ("silu", "linear")
    score_function: str = "softmax"
    aux_loss_coeff: float = 1e-2
    # DeepSeek-style aux-free balancing bias added to routing scores;
    # lives in the "moe_state" collection (updated by the trainer from
    # expert-load counts, not by gradients).
    use_expert_bias: bool = False
    num_groups: int = 0
    group_topk: int = 0
    ep_axis: str = ""               # non-empty => running under shard_map
    dropless: bool = True
    capacity_factor: float = 2.0
    kernel_init: Callable = nn.initializers.lecun_normal()
    scale_axes: Tuple[str, ...] = (sh.W_NO_SHARD_AXES,)
    router_kernel_axes: Tuple[str, ...] = (sh.W_NO_SHARD_AXES,
                                           sh.W_NO_SHARD_AXES)
    kernel_axes_up: Tuple[str, ...] = (sh.EXPERT_AXES, sh.W_FSDP_AXES,
                                       sh.W_TP_AXES)
    kernel_axes_down: Tuple[str, ...] = (sh.EXPERT_AXES, sh.W_TP_AXES,
                                         sh.W_FSDP_AXES)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        del deterministic  # no dropout inside the routed MLP
        acts = normalize_activation_type(self.activations)
        # clamped_swiglu is gated (two FFN halves) despite the 1-tuple
        # sentinel form.
        n_act = 2 if acts == ("clamped_swiglu",) else len(acts)
        h = x.shape[-1]
        e, f = self.num_experts, self.intermediate_dim

        y = LayerNorm(epsilon=self.epsilon, norm_type=self.norm_type,
                      zero_centered_gamma=self.zero_centered_gamma,
                      scale_axes=self.scale_axes, name="ln")(x)

        # Router runs in fp32 (reference: router kernels are fp32-only;
        # pytorch/router.py casts logits up before softmax/topk) and is
        # replicated: it scores ALL experts even under EP.
        router_kernel = self.param(
            "router_kernel",
            _maybe_partition(self.kernel_init, self.router_kernel_axes),
            (h, e), jnp.float32)
        # Under EP (running inside shard_map) this rank holds E/ep
        # experts; param shapes are the LOCAL shard.
        e_param = e
        if self.ep_axis:
            ep = jax.lax.axis_size(self.ep_axis)
            assert e % ep == 0, (e, ep)
            e_param = e // ep
        w_up = self.kernel_param(
            "wi_kernel", self.kernel_init, self.kernel_axes_up,
            (e_param, h, n_act * f), self.dtype)
        w_down = self.kernel_param(
            "wo_kernel", self.kernel_init, self.kernel_axes_down,
            (e_param, f, h), self.dtype)
        expert_bias = None
        if self.use_expert_bias:
            expert_bias = self.variable(
                "moe_state", "expert_bias",
                lambda: jnp.zeros((e,), jnp.float32)).value

        out, aux_loss = moe(
            y, router_kernel, w_up, w_down,
            topk=self.topk,
            activation_type=acts,
            score_function=self.score_function,
            aux_loss_coeff=self.aux_loss_coeff,
            expert_bias=expert_bias,
            num_groups=self.num_groups,
            group_topk=self.group_topk,
            quantizer_sets=(self.quantizer_set("moe_up"),
                            self.quantizer_set("moe_down")),
            ep_axis=self.ep_axis or None,
            capacity_factor=self.capacity_factor,
            dropless=self.dropless)
        self.sow("intermediates", "moe_aux_loss", aux_loss)
        return out.astype(x.dtype)
