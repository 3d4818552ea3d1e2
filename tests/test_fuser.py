"""te.ops Sequential op-fuser (reference: pytorch/ops — sequential.py,
fuser.py, basic/*): fusion planning onto the fused custom-VJP modules,
numerics, residual extra inputs/outputs, and quantized execution."""
import jax
import jax.numpy as jnp

import transformerengine_tpu as te
from transformerengine_tpu import ops


def test_plan_ln_dense():
    seq = ops.Sequential(layer_ops=(ops.RMSNorm(), ops.Linear(64)))
    plan = seq.fusion_plan()
    assert [k for k, _ in plan] == ["ln_dense"]


def test_plan_ln_mlp_gated():
    seq = ops.Sequential(layer_ops=(
        ops.RMSNorm(), ops.Linear(256), ops.SwiGLU(), ops.Linear(32)))
    plan = seq.fusion_plan()
    assert [k for k, _ in plan] == ["ln_mlp"]


def test_plan_mixed():
    seq = ops.Sequential(layer_ops=(
        ops.ConstantScale(2.0), ops.Linear(64), ops.Bias(), ops.GELU(),
        ops.LayerNorm(), ops.Linear(32)))
    plan = seq.fusion_plan()
    assert [k for k, _ in plan] == ["pointwise", "dense", "pointwise",
                                    "ln_dense"]


def test_ln_dense_matches_module():
    """The fused segment IS LayerNormDenseGeneral — applying the
    extracted params through the module directly must agree."""
    from transformerengine_tpu.flax.module import LayerNormDenseGeneral
    seq = ops.Sequential(layer_ops=(ops.RMSNorm(), ops.Linear(64)),
                         dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32), jnp.float32)
    variables = seq.init(jax.random.PRNGKey(1), x)
    y = seq.apply(variables, x)
    sub = {"params": variables["params"]["op0_ln_dense"]}
    ref = LayerNormDenseGeneral(
        features=64, norm_type="rmsnorm", use_bias=False,
        dtype=jnp.float32).apply(sub, x)
    assert jnp.allclose(y, ref)


def test_swiglu_mlp_runs_and_grads():
    seq = ops.Sequential(layer_ops=(
        ops.RMSNorm(), ops.Linear(128), ops.SwiGLU(), ops.Linear(32)),
        dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32), jnp.float32)
    variables = seq.init(jax.random.PRNGKey(1), x)
    y = seq.apply(variables, x)
    assert y.shape == (2, 8, 32)

    def loss(v, x):
        return jnp.sum(seq.apply(v, x) ** 2)

    g = jax.grad(loss)(variables, x)
    flat = jax.tree_util.tree_leaves(g)
    assert all(jnp.all(jnp.isfinite(l)) for l in flat)
    assert any(jnp.max(jnp.abs(l)) > 0 for l in flat)


def test_residual_extra_io():
    seq = ops.Sequential(layer_ops=(
        ops.MakeExtraOutput(),          # fork residual
        ops.LayerNorm(), ops.Linear(16),
        ops.AddExtraInput(),            # join external residual
    ), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16), jnp.float32)
    res = jnp.ones((4, 16), jnp.float32)
    variables = seq.init(jax.random.PRNGKey(1), x, res)
    y, fork = seq.apply(variables, x, res)
    assert fork.shape == x.shape
    assert jnp.allclose(fork, x)
    assert y.shape == (4, 16)


def test_pointwise_ops():
    seq = ops.Sequential(layer_ops=(
        ops.ConstantScale(0.5), ops.Identity(), ops.L2Normalization(),
        ops.Reshape((2, 32)),
    ), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16), jnp.float32)
    variables = seq.init(jax.random.PRNGKey(1), x)
    y = seq.apply(variables, x)
    assert y.shape == (2, 32)
    assert jnp.all(jnp.isfinite(y))


def test_quantized_sequential_fp8():
    """Under autocast the fused segments run the quantized custom-VJP
    path (quantize_meta collection appears and updates)."""
    with te.autocast(enabled=True, recipe=te.DelayedScaling()):
        seq = ops.Sequential(layer_ops=(
            ops.RMSNorm(), ops.Linear(64), ops.GELU(), ops.Linear(32)))
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 32),
                              jnp.bfloat16)
        variables = seq.init(jax.random.PRNGKey(1), x)
        assert "quantize_meta" in variables
        y = seq.apply(variables, x)
        assert y.shape == (16, 32)


def test_quantize_op_fake_quant():
    with te.autocast(enabled=True, recipe=te.Float8CurrentScaling()):
        seq = ops.Sequential(layer_ops=(ops.Quantize(),),
                             dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 32), jnp.float32)
        variables = seq.init(jax.random.PRNGKey(1), x)
        y = seq.apply(variables, x)
    # fake-quantized: close but not identical
    assert jnp.max(jnp.abs(y - x)) < 0.1
    assert not jnp.allclose(y, x)


def test_grouped_linear_op():
    """te.ops.GroupedLinear consumes a group-size extra input and runs
    the grouped GEMM (reference: ops/basic/grouped_linear.py)."""
    from transformerengine_tpu import ops
    e, h, f = 3, 16, 8
    seq = ops.Sequential(layer_ops=(ops.GroupedLinear(f, num_groups=e),),
                         dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (12, h), jnp.float32)
    gs = jnp.array([5, 3, 4], jnp.int32)
    variables = seq.init(jax.random.PRNGKey(1), x, gs)
    out = seq.apply(variables, x, gs)
    assert out.shape == (12, f)
    w = variables["params"]["op0_pointwise_0_kernel"]
    ref = jnp.concatenate([
        x[:5] @ w[0], x[5:8] @ w[1], x[8:] @ w[2]])
    assert jnp.allclose(out, ref, atol=1e-5)
