"""Functional layers (layernorm / layernorm_dense / layernorm_mlp) vs
plain-JAX references — the analog of the reference's
tests/pytorch/test_numerics.py module-vs-torch-reference comparisons."""
import jax
import jax.numpy as jnp
import pytest

import transformerengine_tpu as te
from transformerengine_tpu.layernorm import layernorm, rmsnorm
from transformerengine_tpu.layernorm_dense import layernorm_dense
from transformerengine_tpu.layernorm_mlp import layernorm_mlp
from transformerengine_tpu.ops.activation import act_lu
from transformerengine_tpu.quantize.helper import QuantizerFactory


def _ref_layernorm(x, gamma, beta, eps=1e-6, zero_centered=False):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    g = gamma + 1.0 if zero_centered else gamma
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + beta).astype(x.dtype)


def _ref_rmsnorm(x, gamma, eps=1e-6):
    xf = x.astype(jnp.float32)
    ms = (xf ** 2).mean(-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps) * gamma).astype(x.dtype)


class TestNorms:
    def test_layernorm_matches_reference(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 64))
        gamma = jax.random.normal(jax.random.PRNGKey(1), (64,))
        beta = jax.random.normal(jax.random.PRNGKey(2), (64,))
        out = layernorm(x, gamma, beta)
        ref = _ref_layernorm(x, gamma, beta)
        assert jnp.allclose(out, ref, atol=1e-5)

    def test_layernorm_grads_match_autodiff(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 64))
        gamma = jax.random.normal(jax.random.PRNGKey(1), (64,))
        beta = jnp.zeros((64,))
        f_ours = lambda *a: jnp.sum(layernorm(*a) ** 2)
        f_ref = lambda *a: jnp.sum(_ref_layernorm(*a) ** 2)
        g_ours = jax.grad(f_ours, argnums=(0, 1, 2))(x, gamma, beta)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b in zip(g_ours, g_ref):
            assert jnp.allclose(a, b, atol=1e-4)

    def test_zero_centered_gamma(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 64))
        gamma = jnp.zeros((64,))  # zero-centered: effective gamma = 1
        out = rmsnorm(x, gamma, zero_centered_gamma=True)
        ref = _ref_rmsnorm(x, jnp.ones((64,)))
        assert jnp.allclose(out, ref, atol=1e-5)


class TestActivations:
    @pytest.mark.parametrize("act", ["gelu", "silu", "relu", "qgelu", "srelu"])
    def test_matches_jax(self, act):
        import math
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 32))
        out = act_lu(x, act)
        ref = {
            "gelu": jax.nn.gelu(x, approximate=True),
            "silu": jax.nn.silu(x),
            "relu": jax.nn.relu(x),
            "qgelu": x * jax.nn.sigmoid(1.702 * x),
            "srelu": jnp.where(x > 0, x * x, 0.0),
        }[act]
        assert jnp.allclose(out, ref, atol=1e-5)

    def test_gated(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 2, 32))
        out = act_lu(x, "swiglu")
        ref = jax.nn.silu(x[..., 0, :]) * x[..., 1, :]
        assert jnp.allclose(out, ref, atol=1e-5)

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="unknown activation"):
            act_lu(jnp.ones((2, 2)), "nope")


def _ref_mlp(x, gamma, k1, k2, eps=1e-6):
    h = _ref_rmsnorm(x, gamma, eps)
    z = jnp.einsum("bsh,haf->bsaf", h.astype(jnp.float32),
                   k1.astype(jnp.float32))
    a = jax.nn.silu(z[..., 0, :]) * z[..., 1, :]
    return jnp.einsum("bsf,fh->bsh", a, k2.astype(jnp.float32)).astype(x.dtype)


class TestLayerNormMLP:
    def test_bf16_matches_reference(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64), jnp.float32)
        gamma = jnp.ones((64,))
        k1 = jax.random.normal(jax.random.PRNGKey(1), (64, 2, 128)) * 0.05
        k2 = jax.random.normal(jax.random.PRNGKey(2), (128, 64)) * 0.05
        out = layernorm_mlp(x, gamma, None, k1, k2, norm_type="rmsnorm",
                            activation_type="swiglu")
        ref = _ref_mlp(x, gamma, k1, k2)
        assert jnp.max(jnp.abs(out - ref)) < 1e-4

    def test_bf16_grads_match_autodiff(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64), jnp.float32)
        gamma = jnp.ones((64,))
        k1 = jax.random.normal(jax.random.PRNGKey(1), (64, 2, 128)) * 0.05
        k2 = jax.random.normal(jax.random.PRNGKey(2), (128, 64)) * 0.05
        ours = jax.grad(lambda *a: jnp.sum(layernorm_mlp(
            a[0], a[1], None, a[2], a[3], norm_type="rmsnorm",
            activation_type="swiglu").astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3))(x, gamma, k1, k2)
        ref = jax.grad(lambda *a: jnp.sum(_ref_mlp(*a).astype(jnp.float32) ** 2),
                       argnums=(0, 1, 2, 3))(x, gamma, k1, k2)
        for a, b in zip(ours, ref):
            assert jnp.max(jnp.abs(a - b)) < 5e-3

    def test_fp8_close_to_bf16(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64), jnp.float32)
        gamma = jnp.ones((64,))
        k1 = jax.random.normal(jax.random.PRNGKey(1), (64, 2, 128)) * 0.05
        k2 = jax.random.normal(jax.random.PRNGKey(2), (128, 64)) * 0.05
        qsets = (QuantizerFactory.create_set(te.Float8CurrentScaling()),
                 QuantizerFactory.create_set(te.Float8CurrentScaling()))
        out = layernorm_mlp(x, gamma, None, k1, k2, norm_type="rmsnorm",
                            activation_type="swiglu", quantizer_sets=qsets)
        ref = _ref_mlp(x, gamma, k1, k2)
        denom = jnp.maximum(jnp.max(jnp.abs(ref)), 1e-3)
        assert jnp.max(jnp.abs(out - ref)) / denom < 0.1


class TestLayerNormDense:
    def test_bf16_matches_reference(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
        gamma = jnp.ones((64,))
        k = jax.random.normal(jax.random.PRNGKey(1), (64, 96)) * 0.1
        out = layernorm_dense(x, k, gamma, jnp.zeros((64,)),
                              norm_type="layernorm")
        ref = _ref_layernorm(x, gamma, jnp.zeros((64,))) @ k
        assert jnp.max(jnp.abs(out - ref)) < 1e-4


class TestClampedSwiGLU:
    def test_matches_reference_formula(self):
        from transformerengine_tpu.ops.activation import clamped_swiglu
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 2, 16)) * 10
        out = clamped_swiglu(x, limit=7.0, alpha=1.702)
        v = jnp.minimum(x[..., 0, :], 7.0)
        ref = (v * jax.nn.sigmoid(1.702 * v)) * (
            jnp.clip(x[..., 1, :], -7.0, 7.0) + 1.0)
        assert jnp.max(jnp.abs(out - ref)) < 1e-5

    def test_grads_clamp(self):
        from transformerengine_tpu.ops.activation import clamped_swiglu
        x = jnp.full((1, 2, 4), 100.0)  # both sides beyond the limit
        g = jax.grad(lambda x: jnp.sum(clamped_swiglu(x)))(x)
        assert jnp.allclose(g, 0.0)     # fully clamped -> zero grad


class TestMHC:
    """Manifold hyper-connections (reference: common/triton/mhc.py)."""

    def test_sinkhorn_doubly_stochastic(self):
        from transformerengine_tpu.ops.mhc import mhc_sinkhorn
        h = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 4, 4)) * 2
        p = mhc_sinkhorn(h)
        # the loop normalizes columns last -> column sums exact, rows
        # converge to ~1 within Sinkhorn tolerance
        assert jnp.allclose(p.sum(-2), 1.0, atol=1e-5)
        assert jnp.allclose(p.sum(-1), 1.0, atol=5e-3)
        assert jnp.all(p >= 0)

    def test_scale_gate_ranges(self):
        from transformerengine_tpu.ops.mhc import mhc_projection, mhc_scale
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 64))
        phi = jax.random.normal(jax.random.PRNGKey(1), (24, 64)) * 0.1
        h, ms = mhc_projection(x, phi)
        assert h.shape == (16, 24) and ms.shape == (16,)
        pre, post, res = mhc_scale(h, jnp.ones(3), jnp.zeros(24), ms)
        assert jnp.all((pre > 0) & (pre < 1))       # sigmoid
        assert jnp.all((post > 0) & (post < 2))     # 2*sigmoid
        assert res.shape == (16, 16)

    def test_block_end_to_end_grads(self):
        from transformerengine_tpu.ops.mhc import mhc_block
        s, b, c, n = 4, 2, 32, 4
        x = jax.random.normal(jax.random.PRNGKey(0), (s, b, c, n))
        phi = jax.random.normal(jax.random.PRNGKey(1), (24, c * n)) * 0.05
        w = jax.random.normal(jax.random.PRNGKey(2), (c, c)) * 0.1

        def loss(x, phi, w):
            out = mhc_block(x, lambda a: a @ w, phi, jnp.ones(3),
                            jnp.zeros(24))
            return jnp.sum(out ** 2)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, phi, w)
        assert jnp.isfinite(val)
        for g in grads:
            assert jnp.all(jnp.isfinite(g))

    def test_identity_mixing_preserves_stream(self):
        """With H_res -> permutation-free identity-ish gates the block
        reduces to a plain residual update."""
        from transformerengine_tpu.ops.mhc import mhc_expand_combine
        s, b, c, n = 2, 1, 8, 4
        x = jax.random.normal(jax.random.PRNGKey(0), (s, b, c, n))
        f = jnp.zeros((s, b, c))
        h_post = jnp.zeros((s, b, n))
        h_res = jnp.broadcast_to(jnp.eye(n), (s, b, n, n))
        out = mhc_expand_combine(f, None, h_post, x, h_res)
        assert jnp.allclose(out, x, atol=1e-6)


class TestClampedSwigluMLP:
    def test_layernorm_mlp_clamped_swiglu(self):
        from transformerengine_tpu.ops.activation import clamped_swiglu
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32), jnp.float32)
        gamma = jnp.ones((32,))
        k1 = jax.random.normal(jax.random.PRNGKey(1), (32, 2, 64)) * 0.1
        k2 = jax.random.normal(jax.random.PRNGKey(2), (64, 32)) * 0.1
        out = layernorm_mlp(x, gamma, None, k1, k2, norm_type="rmsnorm",
                            activation_type="clamped_swiglu")
        # reference composition
        h = _ref_rmsnorm(x, gamma)
        z = jnp.einsum("bsh,haf->bsaf", h, k1)
        a = clamped_swiglu(z)
        ref = jnp.einsum("bsf,fh->bsh", a, k2)
        assert jnp.max(jnp.abs(out - ref)) < 1e-4
        g = jax.grad(lambda x: jnp.sum(layernorm_mlp(
            x, gamma, None, k1, k2, norm_type="rmsnorm",
            activation_type="clamped_swiglu") ** 2))(x)
        assert jnp.all(jnp.isfinite(g))
