"""Microbatch weight-quantization caching (reference:
pytorch/module/base.py is_first_microbatch FP8 weight workspace)."""
import jax
import jax.numpy as jnp
import pytest

import transformerengine_tpu as te
from transformerengine_tpu.quantize.microbatch import quantize_kernel

RECIPES = {
    "delayed": te.DelayedScaling(amax_history_len=4),
    "current": te.Float8CurrentScaling(),
    "mxfp8": te.MXFP8BlockScaling(),
}


def _data(key, m=64, k=128, n=256):
    kx, kw, kg = jax.random.split(key, 3)
    x = jax.random.normal(kx, (m, k), jnp.bfloat16)
    w = (jax.random.normal(kw, (k, n)) * 0.05).astype(jnp.bfloat16)
    g = jax.random.normal(kg, (m, n), jnp.bfloat16)
    return x, w, g


@pytest.mark.parametrize("name", sorted(RECIPES))
def test_cached_matches_uncached(name):
    """Same step output and grads whether the kernel is quantized inside
    the layer or once outside via the cache."""
    qset = te.QuantizerFactory.create_set(RECIPES[name])
    x, w, g = _data(jax.random.PRNGKey(0))

    def loss(x, w, qs, cache):
        y = te.dense(x, w, quantizer_set=qs, kernel_cache=cache)
        return jnp.sum(y.astype(jnp.float32) * g.astype(jnp.float32))

    cache, _ = quantize_kernel(w, qset)
    f = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnames=())
    dx0, dw0 = f(x, w, qset, None)
    dx1, dw1 = f(x, w, qset, cache)
    assert jnp.array_equal(dx0, dx1)
    assert jnp.array_equal(dw0, dw1)


def test_kernel_state_updates_once_per_step():
    """Delayed scaling: the cache-time weight amax rides the cache and
    is observed by every microbatch's bwd — the cotangent carries the
    SAME once-per-step roll no matter which microbatch produced it
    (idempotent under last-wins overwrite-with-gradient)."""
    qset = te.QuantizerFactory.create_set(
        te.DelayedScaling(amax_history_len=4))
    x, w, g = _data(jax.random.PRNGKey(1))
    x2, _, _ = _data(jax.random.PRNGKey(7))
    cache, qset_back = quantize_kernel(w, qset)
    # the set comes back unchanged; the observation rides the cache
    assert jnp.array_equal(qset_back.kernel.amax_history,
                           qset.kernel.amax_history)
    assert cache.amax is not None and float(cache.amax) > 0.0

    def run(xx, qs, cache):
        def f(qs):
            return jnp.sum(te.dense(xx, w, quantizer_set=qs,
                                    kernel_cache=cache))
        return jax.vjp(f, qs)[1](jnp.bfloat16(1.0))[0]

    upd_mb0 = run(x, qset, cache)
    upd_mb1 = run(x2, qset, cache)
    # kernel history rolled once, with the cache amax, on BOTH
    # microbatches (identical — whichever cotangent the caller keeps
    # carries the step's weight observation)
    assert float(upd_mb0.kernel.amax_history[-1]) > 0.0
    assert jnp.array_equal(upd_mb0.kernel.amax_history,
                           upd_mb1.kernel.amax_history)
    # and it matches what an in-layer (uncached) quantize observes
    upd_plain = run(x, qset, None)
    assert jnp.array_equal(upd_mb0.kernel.amax_history,
                           upd_plain.kernel.amax_history)
    # x / dgrad quantizers still update per microbatch
    assert float(upd_mb0.x.amax_history[-1]) > 0.0


@pytest.mark.parametrize("name", ["delayed", "mxfp8"])
def test_layernorm_dense_cached(name):
    qset = te.QuantizerFactory.create_set(RECIPES[name])
    x, w, g = _data(jax.random.PRNGKey(4))
    gamma = jnp.ones((x.shape[-1],), jnp.float32)

    def loss(x, w, cache):
        y = te.layernorm_dense(x, w, gamma, norm_type="rmsnorm",
                               quantizer_set=qset, kernel_cache=cache)
        return jnp.sum(y.astype(jnp.float32) * g.astype(jnp.float32))

    cache, _ = quantize_kernel(w, qset)
    d0 = jax.grad(loss, argnums=(0, 1))(x, w, None)
    d1 = jax.grad(loss, argnums=(0, 1))(x, w, cache)
    for a, b in zip(d0, d1):
        assert jnp.array_equal(a, b)


@pytest.mark.parametrize("name", ["delayed", "mxfp8"])
def test_layernorm_mlp_cached(name):
    qsets = (te.QuantizerFactory.create_set(RECIPES[name]),
             te.QuantizerFactory.create_set(RECIPES[name]))
    key = jax.random.PRNGKey(5)
    kx, k1, k2 = jax.random.split(key, 3)
    H, F = 128, 256
    x = jax.random.normal(kx, (32, H), jnp.bfloat16)
    w1 = (jax.random.normal(k1, (H, 2, F)) * 0.05).astype(jnp.bfloat16)
    w2 = (jax.random.normal(k2, (F, H)) * 0.05).astype(jnp.bfloat16)
    gamma = jnp.ones((H,), jnp.float32)

    def loss(x, w1, w2, caches):
        y = te.layernorm_mlp(x, gamma, None, w1, w2,
                             norm_type="rmsnorm",
                             activation_type=("silu", "linear"),
                             quantizer_sets=qsets, kernel_caches=caches)
        return jnp.sum(y.astype(jnp.float32))

    c1, _ = quantize_kernel(w1, qsets[0])
    c2, _ = quantize_kernel(w2, qsets[1])
    d0 = jax.grad(loss, argnums=(0, 1, 2))(x, w1, w2, None)
    d1 = jax.grad(loss, argnums=(0, 1, 2))(x, w1, w2, (c1, c2))
    for a, b in zip(d0, d1):
        assert jnp.array_equal(a, b)


def test_flax_kernel_cache_collection():
    """Flax-native is_first_microbatch: build the cache with
    mutable=["kernel_cache"], reuse by feeding the collection back."""
    import flax.linen as nn
    from transformerengine_tpu.flax import DenseGeneral

    model = DenseGeneral(features=256, use_bias=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 128), jnp.bfloat16)
    with __import__("transformerengine_tpu").autocast(
            te.MXFP8BlockScaling()):
        variables = model.init(jax.random.PRNGKey(1), x)
        assert "kernel_cache" not in variables  # not built at init
        # first microbatch: build
        y0, mut = model.apply(variables, x, mutable=["kernel_cache"])
        assert "kernel" in mut["kernel_cache"]
        # later microbatches: reuse (no mutable) — same output bits
        y1 = model.apply({**variables, **mut}, x)
        assert jnp.array_equal(y0, y1)
        # grads flow to the raw kernel with the cache engaged
        g = jax.grad(lambda v: jnp.sum(model.apply(
            {**v, **mut}, x).astype(jnp.float32)))(variables)
        assert g["params"]["kernel"].shape == (128, 256)


def test_cache_under_grad_accumulation():
    """Two microbatches reusing one cache == reference semantics: one
    weight quantize per step, grads accumulate on the master kernel."""
    qset = te.QuantizerFactory.create_set(te.Float8CurrentScaling())
    x1, w, g = _data(jax.random.PRNGKey(2))
    x2, _, _ = _data(jax.random.PRNGKey(3))
    cache, qset = quantize_kernel(w, qset)

    @jax.jit
    def microbatch_grad(x, w, cache):
        return jax.grad(
            lambda w: jnp.sum(te.dense(x, w, quantizer_set=qset,
                                       kernel_cache=cache)))(w)

    acc = microbatch_grad(x1, w, cache) + microbatch_grad(x2, w, cache)
    assert acc.shape == w.shape
    assert bool(jnp.all(jnp.isfinite(acc.astype(jnp.float32))))


@pytest.mark.parametrize("name", ["current", "mxfp8"])
def test_grouped_dense_cached(name):
    """grouped_dense kernel cache == in-layer quantize (reference:
    quantize_weight workspace covers GroupedLinear too)."""
    from transformerengine_tpu.grouped_dense import grouped_dense
    from transformerengine_tpu.quantize.microbatch import (
        quantize_grouped_kernel)
    qset = te.QuantizerFactory.create_set(RECIPES[name])
    E, K, M, N = 2, 64, 128, 96
    key = jax.random.PRNGKey(6)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (N, K), jnp.bfloat16)
    w = (jax.random.normal(kw, (E, K, M)) * 0.05).astype(jnp.bfloat16)
    gs = jnp.asarray([32, 64], jnp.int32)

    def loss(x, w, cache):
        y = grouped_dense(x, w, gs, quantizer_set=qset, kernel_cache=cache)
        return jnp.sum(y.astype(jnp.float32))

    cache, _ = quantize_grouped_kernel(w, qset)
    d0 = jax.grad(loss, argnums=(0, 1))(x, w, None)
    d1 = jax.grad(loss, argnums=(0, 1))(x, w, cache)
    for a, b in zip(d0, d1):
        assert jnp.array_equal(a, b)


def test_moe_kernel_caches():
    from transformerengine_tpu.moe import moe
    from transformerengine_tpu.quantize.microbatch import (
        quantize_grouped_kernel)
    qsets = (te.QuantizerFactory.create_set(RECIPES["mxfp8"]),
             te.QuantizerFactory.create_set(RECIPES["mxfp8"]))
    key = jax.random.PRNGKey(7)
    kx, kr, k1, k2 = jax.random.split(key, 4)
    T, H, F, E = 64, 64, 96, 4
    x = jax.random.normal(kx, (T, H), jnp.bfloat16)
    router = jax.random.normal(kr, (H, E), jnp.float32) * 0.1
    w_up = (jax.random.normal(k1, (E, H, 2 * F)) * 0.05).astype(jnp.bfloat16)
    w_down = (jax.random.normal(k2, (E, F, H)) * 0.05).astype(jnp.bfloat16)
    c1, _ = quantize_grouped_kernel(w_up, qsets[0])
    c2, _ = quantize_grouped_kernel(w_down, qsets[1])
    y0, a0 = moe(x, router, w_up, w_down, quantizer_sets=qsets)
    y1, a1 = moe(x, router, w_up, w_down, quantizer_sets=qsets,
                 kernel_caches=(c1, c2))
    assert jnp.array_equal(y0, y1)
    assert jnp.array_equal(a0, a1)


def test_moe_ep_kernel_caches():
    """EP dropless MoE with per-shard expert kernel caches matches the
    uncached EP path bit-exactly (the cache is built from the LOCAL
    expert shard inside shard_map, like the weights themselves;
    reference: pytorch/module/base.py:744 weight workspace under EP)."""
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh, PartitionSpec as P

    from transformerengine_tpu.moe import moe
    from transformerengine_tpu.quantize.microbatch import (
        quantize_grouped_kernel)

    qsets = (te.QuantizerFactory.create_set(RECIPES["mxfp8"]),
             te.QuantizerFactory.create_set(RECIPES["mxfp8"]))
    key = jax.random.PRNGKey(11)
    kx, kr, k1, k2 = jax.random.split(key, 4)
    T, H, F, E, EP = 64, 64, 96, 4, 4
    x = jax.random.normal(kx, (T, H), jnp.bfloat16)
    router = jax.random.normal(kr, (H, E), jnp.float32) * 0.1
    w_up = (jax.random.normal(k1, (E, H, 2 * F)) * 0.05).astype(jnp.bfloat16)
    w_down = (jax.random.normal(k2, (E, F, H)) * 0.05).astype(jnp.bfloat16)
    mesh = Mesh(mesh_utils.create_device_mesh((EP,), jax.devices()[:EP]),
                ("ep",))

    def local_fn(x, rw, wu, wd, use_cache):
        caches = None
        if use_cache:
            c1, _ = quantize_grouped_kernel(wu, qsets[0])
            c2, _ = quantize_grouped_kernel(wd, qsets[1])
            caches = (c1, c2)
        out, _ = moe(x, rw, wu, wd, topk=2, activation_type="swiglu",
                     quantizer_sets=qsets, ep_axis="ep", dropless=True,
                     kernel_caches=caches)
        return out

    outs = {}
    for use_cache in (False, True):
        fn = jax.shard_map(
            lambda x, rw, wu, wd, u=use_cache: local_fn(x, rw, wu, wd, u),
            mesh=mesh, in_specs=(P("ep"), P(), P("ep"), P("ep")),
            out_specs=P("ep"), check_vma=False)
        outs[use_cache] = fn(x, router, w_up, w_down)
    assert jnp.array_equal(outs[False], outs[True])
