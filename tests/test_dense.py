"""Tests for the functional dense layer (fwd/bwd numerics vs exact
reference, all recipes; mirrors tests/pytorch/test_numerics.py style)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transformerengine_tpu as te
from transformerengine_tpu.dense import dense, dense_and_state


def make_inputs(key=0, m=32, k=64, n=128, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(ks[0], (m, k), dtype)
    w = jax.random.normal(ks[1], (k, n), dtype) / np.sqrt(k)
    b = jax.random.normal(ks[2], (n,), dtype)
    return x, w, b


def ref_loss(x, w, b):
    return (jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32))
            + b.astype(jnp.float32)).sum()


ALL_RECIPES = [
    te.DelayedScaling(),
    te.Float8CurrentScaling(),
    te.MXFP8BlockScaling(),
    te.Float8BlockScaling(),
    te.NVFP4BlockScaling(),
]


class TestDenseBF16:
    def test_fwd_matches_reference(self):
        x, w, b = make_inputs()
        out = dense(x, w, b)
        ref = (x.astype(jnp.float32) @ w.astype(jnp.float32) + b.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                                   rtol=0.05, atol=0.1)

    def test_grads_match_reference(self):
        x, w, b = make_inputs()
        g = jax.grad(lambda *a: dense(*a).astype(jnp.float32).sum(), (0, 1, 2))(x, w, b)
        gr = jax.grad(ref_loss, (0, 1, 2))(x, w, b)
        for a, r in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(r, np.float32), rtol=0.05, atol=0.5)

    def test_nd_input(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (64, 32), jnp.bfloat16)
        out = dense(x, w)
        assert out.shape == (2, 8, 32)

    def test_multidim_contraction(self):
        # attention output projection: (B, S, H, D) x (H, D, M)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4, 16), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 32), jnp.bfloat16)
        out = dense(x, w, contracting_dims=((-2, -1), (0, 1)))
        assert out.shape == (2, 8, 32)
        ref = jnp.einsum("bshd,hdm->bsm", x.astype(jnp.float32), w.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                                   rtol=0.05, atol=0.25)


class TestDenseQuantized:
    @pytest.mark.parametrize("recipe", ALL_RECIPES,
                             ids=lambda r: type(r).__name__)
    def test_fwd_bwd_close_to_bf16(self, recipe):
        x, w, b = make_inputs(m=64, k=128, n=256)
        qs = te.QuantizerFactory.create_set(recipe)
        is_fp4 = isinstance(recipe, te.NVFP4BlockScaling)
        # Delayed scaling needs one step to calibrate scales.
        if isinstance(recipe, te.DelayedScaling):
            _, qs = dense_and_state(x, w, b, quantizer_set=qs)

        out = dense(x, w, b, quantizer_set=qs)
        ref = x.astype(jnp.float32) @ w.astype(jnp.float32) + b.astype(jnp.float32)
        tol = 0.25 if is_fp4 else 0.08
        err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).mean() / (
            np.abs(np.asarray(ref)).mean() + 1e-6)
        assert err < tol, f"fwd rel err {err}"

        g = jax.grad(lambda xx, ww: dense(xx, ww, b, quantizer_set=qs)
                     .astype(jnp.float32).sum(), (0, 1))(x, w)
        gr = jax.grad(ref_loss, (0, 1))(x, w, b)
        for a, r in zip(g, gr):
            err = np.abs(np.asarray(a, np.float32) - np.asarray(r, np.float32)).mean() / (
                np.abs(np.asarray(r, np.float32)).mean() + 1e-6)
            assert err < (0.4 if is_fp4 else 0.15), f"bwd rel err {err}"

    def test_delayed_scaling_state_updates(self):
        x, w, b = make_inputs()
        qs = te.QuantizerFactory.create_set(te.DelayedScaling(amax_history_len=8))
        out, qs2 = dense_and_state(x, w, b, quantizer_set=qs)
        # After one step scales are calibrated to the data.
        assert float(qs2.x.scale[0]) != 1.0
        assert float(qs2.kernel.scale[0]) != 1.0
        assert float(qs2.dgrad.scale[0]) != 1.0
        # amax history recorded
        assert float(qs2.x.amax_history.max()) > 0

    def test_jit_compiles_once(self):
        x, w, b = make_inputs()
        qs = te.QuantizerFactory.create_set(te.Float8CurrentScaling())

        @jax.jit
        def step(x, w, b, qs):
            return dense(x, w, b, quantizer_set=qs)

        out1 = step(x, w, b, qs)
        out2 = step(x * 2, w, b, qs)
        assert out1.shape == out2.shape

    def test_under_shard_map_mesh(self):
        """dense with sharded inputs over a 8-device CPU mesh (TP column
        parallel): XLA should partition the GEMM with no code changes."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        devs = np.array(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("dp", "tp"))
        x, w, b = make_inputs(m=64, k=128, n=256)
        qs = te.QuantizerFactory.create_set(te.Float8CurrentScaling())
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
        ws = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))
        bs = jax.device_put(b, NamedSharding(mesh, P("tp")))
        with mesh:
            out = jax.jit(lambda x, w, b: dense(x, w, b, quantizer_set=qs))(xs, ws, bs)
        ref = x.astype(jnp.float32) @ w.astype(jnp.float32) + b.astype(jnp.float32)
        err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).mean() / (
            np.abs(np.asarray(ref)).mean())
        assert err < 0.08
