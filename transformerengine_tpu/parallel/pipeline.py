"""Pipeline parallelism: microbatch-streamed stage execution.

The reference scopes PP out of the library (Megatron owns the schedule;
TE only excludes the PP axis from amax reduction — reference:
jax/sharding.py:444, pytorch quantization.py amax groups). On TPU the
natural home for the schedule is inside the framework: a GPipe-style
loop under ``shard_map`` over the ``pp`` mesh axis, activations handed
to the next stage with ``lax.ppermute`` (XLA overlaps the ICI transfer
with the next step's compute). Differentiable by construction — the
backward pipeline is the AD transpose of the forward loop (ppermute
transposes to the reverse rotation), so 1F1B-style interleaving is left
to XLA's scheduler rather than hand-managed queues.

Layout contract (all inside one ``shard_map``):
* stage parameters: any pytree whose leaves carry a leading stage axis
  sharded over ``pp`` (each device sees its own stage's slice, leading
  axis length 1 locally — the loop squeezes it).
* input microbatches: (n_micro, mb, ...) replicated over ``pp``.
* output: (n_micro, mb, ...) replicated (every device returns the
  completed stream; only the last stage's compute produced it).

The loop runs n_micro + pp - 1 ticks; each device computes every tick
(the classic bubble: (pp-1)/(n_micro+pp-1) of ticks are wasted on
drained stages), so efficiency approaches 1 as n_micro grows — same
envelope as GPipe/Megatron non-interleaved schedules.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _rotate(x, axis_name, reverse=False):
    pp = jax.lax.axis_size(axis_name)
    if reverse:
        perm = [(d, (d - 1) % pp) for d in range(pp)]
    else:
        perm = [(d, (d + 1) % pp) for d in range(pp)]
    return jax.lax.ppermute(x, axis_name, perm)


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    microbatches: jax.Array,
    axis_name: str = "pp",
) -> jax.Array:
    """Run ``stage_fn`` as a pp-deep pipeline over a microbatch stream.

    Must be called inside ``shard_map`` with ``axis_name`` in the mesh.
    ``stage_params`` leaves have a local leading axis of length 1 (this
    rank's stage); ``microbatches`` is (n_micro, mb, ...) and the result
    has the same shape, equal to applying the pp stages sequentially to
    each microbatch.
    """
    pp = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    params = jax.tree.map(lambda p: p[0], stage_params)
    n_micro = microbatches.shape[0]
    mb_shape = microbatches.shape[1:]
    ticks = n_micro + pp - 1

    state = jnp.zeros(mb_shape, microbatches.dtype)   # in-flight activation
    out = jnp.zeros((n_micro, *mb_shape), microbatches.dtype)

    def tick(t, carry):
        state, out = carry
        # Stage 0 ingests microbatch t (while t < n_micro); other stages
        # consume what the previous tick handed them.
        feed_idx = jnp.clip(t, 0, n_micro - 1)
        inject = jax.lax.dynamic_index_in_dim(
            microbatches, feed_idx, keepdims=False)
        x = jnp.where(idx == 0, inject, state)
        y = stage_fn(params, x)
        # The last stage completed microbatch t - (pp - 1); store it.
        done_idx = jnp.clip(t - (pp - 1), 0, n_micro - 1)
        store = jnp.logical_and(idx == pp - 1, t >= pp - 1)
        cur = jax.lax.dynamic_index_in_dim(out, done_idx, keepdims=False)
        out = jax.lax.dynamic_update_index_in_dim(
            out, jnp.where(store, y, cur), done_idx, axis=0)
        # Hand activations downstream (ICI neighbor exchange).
        state = _rotate(y, axis_name)
        return state, out

    # fori_loop keeps the schedule compiled-size-independent of n_micro;
    # AD requires scan-style checkpointing, so use scan (same trip count)
    # to stay differentiable.
    def scan_tick(carry, t):
        return tick(t, carry), None

    (state, out), _ = jax.lax.scan(
        scan_tick, (state, out), jnp.arange(ticks))
    # Every rank returns the stream; ranks != pp-1 contributed zeros, so
    # a sum-reduce replicates the completed outputs everywhere (exactly
    # one rank is nonzero per element — pmax would corrupt negatives).
    return jax.lax.psum(out, axis_name)


def pipeline_transformer(
    layer_fn: Callable[[Any, jax.Array], jax.Array],
    layer_params: Any,
    x: jax.Array,
    *,
    n_microbatches: int,
    axis_name: str = "pp",
    layers_per_stage: int = 1,
) -> jax.Array:
    """Convenience wrapper: ``layer_params`` leaves carry a leading axis
    of (local) ``layers_per_stage`` stacked layers; each stage scans its
    slice (scan-over-layers inside, pipeline outside — the standard
    Megatron decomposition)."""
    b = x.shape[0]
    assert b % n_microbatches == 0, (b, n_microbatches)
    mb = b // n_microbatches
    micro = x.reshape(n_microbatches, mb, *x.shape[1:])

    def stage_fn(params, h):
        def body(h, layer):
            return layer_fn(layer, h), None
        h, _ = jax.lax.scan(body, h, params)
        return h

    # pipeline_apply squeezes a leading length-1 stage axis; wrap the
    # per-stage stack so each rank's slice arrives as (1, layers, ...).
    wrapped = jax.tree.map(lambda p: p[None], layer_params)
    out = pipeline_apply(stage_fn, wrapped, micro, axis_name)
    return out.reshape(b, *x.shape[1:])
