"""Fusible-operation pipeline: the ``te.ops`` Sequential API.

TPU counterpart of the reference's op-fuser (reference: pytorch/ops —
op.py, sequential.py, fuser.py, basic/*, fused/*). The reference builds
a pipeline of ``BasicOperation``s and pattern-matches adjacent ops into
hand-written fused autograd functions (forward_linear_bias_activation,
backward_linear_add, ...).

TPU redesign: ops are declarative frozen dataclasses and ``Sequential``
is a Flax module that plans fusions ONCE at trace time, mapping op runs
onto this repo's fused custom-VJP modules:

    Norm → Linear [→ Bias]                 => LayerNormDenseGeneral
    Norm → Linear → Act → Linear [→ Bias]  => LayerNormMLP
    Linear [→ Bias] / GroupedLinear        => DenseGeneral / grouped_dense

which carry the quantizer state and the Pallas quantize/GEMM kernels.
Whatever doesn't match a fused pattern lowers to plain jnp ops — under
jit, XLA fuses pointwise chains into their producers, so the reference's
pointwise fused ops (bias+activation, scale+add, ...) need no TPU
counterpart. The plan is inspectable (``Sequential.fusion_plan()``), and
tests assert the matching.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# NOTE: .ops imports must stay function-local — ops/__init__ re-exports
# this module's names, so a top-level import here would be circular.


class Op:
    """Marker base class for fusible ops."""


@dataclasses.dataclass(frozen=True)
class Identity(Op):
    pass


@dataclasses.dataclass(frozen=True)
class Reshape(Op):
    shape: Tuple[int, ...] = ()


@dataclasses.dataclass(frozen=True)
class ConstantScale(Op):
    scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class LayerNorm(Op):
    epsilon: float = 1e-6
    zero_centered_gamma: bool = False


@dataclasses.dataclass(frozen=True)
class RMSNorm(Op):
    epsilon: float = 1e-6
    zero_centered_gamma: bool = False


@dataclasses.dataclass(frozen=True)
class L2Normalization(Op):
    epsilon: float = 1e-6


@dataclasses.dataclass(frozen=True)
class Linear(Op):
    """Bias-free linear (reference basic/basic_linear.py); pair with
    ``Bias`` for the biased form — the fuser folds it in."""
    features: int = 0


@dataclasses.dataclass(frozen=True)
class Bias(Op):
    pass


@dataclasses.dataclass(frozen=True)
class GroupedLinear(Op):
    """Grouped (multi-expert) linear over expert-contiguous rows;
    consumes the next extra positional input as the (num_groups,)
    group-size vector (reference: ops/basic/grouped_linear.py +
    module/grouped_linear.py). Lowers to the block-scaled ragged
    grouped GEMM."""
    features: int = 0
    num_groups: int = 1


@dataclasses.dataclass(frozen=True)
class Activation(Op):
    """Pointwise or gated activation; ``name`` accepts everything
    ops/activation.py does ('gelu', 'silu', 'swiglu', 'geglu', ...)."""
    name: str = "gelu"


def GELU() -> Activation:      # noqa: N802 — reference op-class names
    return Activation("gelu")


def ReLU() -> Activation:      # noqa: N802
    return Activation("relu")


def SwiGLU() -> Activation:    # noqa: N802
    return Activation("swiglu")


def GeGLU() -> Activation:     # noqa: N802
    return Activation("geglu")


@dataclasses.dataclass(frozen=True)
class Dropout(Op):
    rate: float = 0.0


@dataclasses.dataclass(frozen=True)
class Quantize(Op):
    """Fake-quantize the stream through the ambient recipe's x-quantizer
    (reference basic/quantize.py)."""


@dataclasses.dataclass(frozen=True)
class AllReduce(Op):
    axis: str = "tp"


@dataclasses.dataclass(frozen=True)
class AllGather(Op):
    """All-gather along the leading (sequence/data) dim of mesh axis
    ``axis`` (reference basic/all_gather.py)."""
    axis: str = "tp"


@dataclasses.dataclass(frozen=True)
class ReduceScatter(Op):
    axis: str = "tp"


@dataclasses.dataclass(frozen=True)
class AddExtraInput(Op):
    """Consume the next extra positional input (residual add;
    reference basic/add_extra_input.py)."""


@dataclasses.dataclass(frozen=True)
class MakeExtraOutput(Op):
    """Emit the current stream as an extra output (residual fork;
    reference basic/make_extra_output.py)."""


_NORMS = (LayerNorm, RMSNorm)


def _plan(ops: Sequence[Op]):
    """Greedy fusion plan: list of (kind, ops_slice) segments, where
    kind is one of 'ln_mlp', 'ln_dense', 'dense', 'pointwise'."""
    plan = []
    i = 0
    n = len(ops)

    def bias_at(j):
        return j < n and isinstance(ops[j], Bias)

    while i < n:
        o = ops[i]
        if isinstance(o, _NORMS) and i + 1 < n and isinstance(
                ops[i + 1], Linear):
            # Norm->Linear[->Bias][->Act->Linear[->Bias]] longest match.
            j = i + 2
            b1 = bias_at(j)
            j += 1 if b1 else 0
            if (j + 1 < n and isinstance(ops[j], Activation)
                    and isinstance(ops[j + 1], Linear)):
                j += 2
                j += 1 if bias_at(j) else 0
                plan.append(("ln_mlp", tuple(ops[i:j])))
            else:
                plan.append(("ln_dense", tuple(ops[i:j])))
            i = j
        elif isinstance(o, Linear):
            j = i + 1
            j += 1 if bias_at(j) else 0
            plan.append(("dense", tuple(ops[i:j])))
            i = j
        else:
            # Pointwise run: everything up to the next Linear or the
            # next Norm that directly precedes a Linear (which belongs
            # to a fused segment; a standalone Norm is pointwise).
            run = []
            while i < n:
                cur = ops[i]
                if isinstance(cur, Linear):
                    break
                if (isinstance(cur, _NORMS) and i + 1 < n
                        and isinstance(ops[i + 1], Linear)):
                    break
                run.append(cur)
                i += 1
            plan.append(("pointwise", tuple(run)))
    return plan


class Sequential(nn.Module):
    """te.ops.Sequential — a pipeline of fusible ops (reference:
    pytorch/ops/sequential.py + fuser.py).

    Call with the input and any extra inputs consumed by
    ``AddExtraInput`` ops; returns the output, or a tuple
    (output, *extra_outputs) when ``MakeExtraOutput`` ops are present.
    """
    layer_ops: Tuple[Op, ...]
    dtype: Any = jnp.bfloat16

    def fusion_plan(self):
        return [(kind, seg) for kind, seg in _plan(self.layer_ops)]

    @nn.compact
    def __call__(self, x: jax.Array, *extra_inputs,
                 deterministic: bool = True):
        from .flax.module import (DenseGeneral, LayerNormDenseGeneral,
                                  LayerNormMLP)
        from .ops import activation as act_ops

        extra_in = list(extra_inputs)
        extra_out = []
        seg_idx = 0
        for kind, seg in _plan(self.layer_ops):
            name = f"op{seg_idx}_{kind}"
            seg_idx += 1
            if kind == "ln_dense":
                norm, lin = seg[0], seg[1]
                x = LayerNormDenseGeneral(
                    features=lin.features,
                    epsilon=norm.epsilon,
                    norm_type=("rmsnorm" if isinstance(norm, RMSNorm)
                               else "layernorm"),
                    zero_centered_gamma=norm.zero_centered_gamma,
                    use_bias=any(isinstance(s, Bias) for s in seg),
                    dtype=self.dtype, name=name)(x)
            elif kind == "ln_mlp":
                norm = seg[0]
                linears = [s for s in seg if isinstance(s, Linear)]
                act = next(s for s in seg if isinstance(s, Activation))
                acts = act_ops.normalize_activation_type(act.name)
                # Linear features hold the PROJECTED width; for gated
                # activations the intermediate dim is features/2.
                inter = linears[0].features // (2 if len(acts) == 2 else 1)
                x = LayerNormMLP(
                    intermediate_dim=inter,
                    epsilon=norm.epsilon,
                    norm_type=("rmsnorm" if isinstance(norm, RMSNorm)
                               else "layernorm"),
                    zero_centered_gamma=norm.zero_centered_gamma,
                    use_bias=any(isinstance(s, Bias) for s in seg),
                    activations=acts,
                    dtype=self.dtype, name=name)(
                        x, deterministic=deterministic)
            elif kind == "dense":
                lin = seg[0]
                x = DenseGeneral(
                    features=lin.features,
                    use_bias=any(isinstance(s, Bias) for s in seg),
                    dtype=self.dtype, name=name)(x)
            else:
                for k, op in enumerate(seg):
                    x = self._pointwise(op, x, extra_in, extra_out,
                                        deterministic, f"{name}_{k}")
        if extra_out:
            return (x, *extra_out)
        return x

    def _pointwise(self, op, x, extra_in, extra_out, deterministic, name):
        from .flax.module import LayerNorm as LayerNormModule
        from .ops import activation as act_ops
        if isinstance(op, Identity):
            return x
        if isinstance(op, Reshape):
            return x.reshape(op.shape)
        if isinstance(op, ConstantScale):
            return x * op.scale
        if isinstance(op, (LayerNorm, RMSNorm)):
            return LayerNormModule(
                epsilon=op.epsilon,
                norm_type=("rmsnorm" if isinstance(op, RMSNorm)
                           else "layernorm"),
                zero_centered_gamma=op.zero_centered_gamma,
                name=name)(x)
        if isinstance(op, L2Normalization):
            n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), -1,
                                 keepdims=True) + op.epsilon)
            return (x.astype(jnp.float32) / n).astype(x.dtype)
        if isinstance(op, Activation):
            return act_ops.act_lu(x, op.name)
        if isinstance(op, Bias):
            b = self.param(f"{name}_bias", nn.initializers.zeros,
                           (x.shape[-1],), self.dtype)
            return x + b
        if isinstance(op, Dropout):
            if deterministic or op.rate == 0.0:
                return x
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - op.rate, x.shape)
            return jnp.where(keep, x / (1.0 - op.rate), 0)
        if isinstance(op, Quantize):
            from .quantize.helper import QuantizerFactory, get_quantize_config
            from .quantize.quantizer import QuantizeLayout
            cfg = get_quantize_config()
            if not cfg.enabled or cfg.recipe is None:
                return x
            q = QuantizerFactory.create(cfg.recipe, "x",
                                        QuantizeLayout.ROWWISE)
            if q is None:
                return x
            return q.quantize(x).dequantize().astype(x.dtype)
        if isinstance(op, AllReduce):
            return jax.lax.psum(x, op.axis)
        if isinstance(op, AllGather):
            return jax.lax.all_gather(x, op.axis, axis=0, tiled=True)
        if isinstance(op, ReduceScatter):
            return jax.lax.psum_scatter(x, op.axis, scatter_dimension=0,
                                        tiled=True)
        if isinstance(op, GroupedLinear):
            from .grouped_dense import grouped_dense
            w = self.param(
                f"{name}_kernel", nn.initializers.lecun_normal(),
                (op.num_groups, x.shape[-1], op.features), self.dtype)
            group_sizes = extra_in.pop(0)
            return grouped_dense(x, w, group_sizes)
        if isinstance(op, AddExtraInput):
            return x + extra_in.pop(0)
        if isinstance(op, MakeExtraOutput):
            extra_out.append(x)
            return x
        raise NotImplementedError(f"unhandled op {op!r}")
