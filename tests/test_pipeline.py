"""Pipeline parallelism (parallel/pipeline.py) vs sequential reference.

The reference scopes PP out (Megatron owns it); here the GPipe-style
shard_map schedule is part of the framework, so it gets the same
treatment as the CP strategies: multi-device output and grads compared
against the single-device sequential stack (reference test analog:
tests/pytorch/distributed — CP/TP vs single-GPU comparisons)."""
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import mesh_utils
from jax.sharding import Mesh, PartitionSpec as P

from transformerengine_tpu.parallel.pipeline import (
    pipeline_apply, pipeline_transformer)

PP = 4


def _mesh():
    return Mesh(mesh_utils.create_device_mesh((PP,), jax.devices()[:PP]),
                ("pp",))


def _layer(params, x):
    w, b = params
    return jnp.tanh(x @ w + b)


def _stack_params(n_layers, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    w = jax.random.normal(ks[0], (n_layers, d, d)) * (d ** -0.5)
    b = jax.random.normal(ks[1], (n_layers, d)) * 0.1
    return w, b


def _sequential(params, x):
    def body(h, layer):
        return _layer(layer, h), None
    out, _ = jax.lax.scan(body, x, params)
    return out


@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_matches_sequential(n_micro):
    d, b = 16, 32
    params = _stack_params(PP, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (n_micro, b // n_micro, d))

    mesh = _mesh()
    out = jax.shard_map(
        lambda p, m: pipeline_apply(_layer, p, m, "pp"),
        mesh=mesh,
        in_specs=(P("pp"), P()),
        out_specs=P(),
        check_vma=False)(params, x)
    ref = _sequential(params, x.reshape(b, d)).reshape(n_micro, -1, d)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_pipeline_transformer_multiple_layers_per_stage():
    d, b, per_stage = 8, 16, 2
    params = _stack_params(PP * per_stage, d)
    x = jax.random.normal(jax.random.PRNGKey(2), (b, d))

    mesh = _mesh()
    out = jax.shard_map(
        lambda p, xx: pipeline_transformer(
            _layer, p, xx, n_microbatches=4, axis_name="pp",
            layers_per_stage=per_stage),
        mesh=mesh,
        in_specs=(P("pp"), P()),
        out_specs=P(),
        check_vma=False)(params, x)
    ref = _sequential(params, x)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_pipeline_grads_match_sequential():
    """The backward pipeline is the AD transpose of the forward loop."""
    d, b, n_micro = 8, 16, 4
    params = _stack_params(PP, d, seed=3)
    x = jax.random.normal(jax.random.PRNGKey(4), (n_micro, b // n_micro, d))
    mesh = _mesh()

    pipe = jax.shard_map(
        lambda p, m: pipeline_apply(_layer, p, m, "pp"),
        mesh=mesh, in_specs=(P("pp"), P()), out_specs=P(),
        check_vma=False)

    def loss_pipe(params, x):
        return jnp.sum(pipe(params, x) ** 2)

    def loss_ref(params, x):
        return jnp.sum(_sequential(params, x.reshape(b, d)) ** 2)

    g = jax.grad(loss_pipe, argnums=(0, 1))(params, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    for a, r in zip(jax.tree.leaves(g), jax.tree.leaves(gr)):
        assert float(jnp.max(jnp.abs(a - r.reshape(a.shape)))) < 1e-4
