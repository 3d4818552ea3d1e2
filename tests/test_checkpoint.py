"""Checkpoint/resume: quantizer state round-trips bitwise; remat
policies run (reference analog: tests/pytorch/test_checkpoint.py +
extra-state serialization tests)."""
import tempfile

import jax
import jax.numpy as jnp
import pytest

import transformerengine_tpu as te
from transformerengine_tpu.flax import QUANTIZE_META, LayerNormMLP
from transformerengine_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint, state_with_quantize_meta)


class TestCheckpoint:
    def test_quantize_meta_roundtrip_bitwise(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32), jnp.float32)
        with te.autocast(enabled=True,
                         recipe=te.DelayedScaling(amax_history_len=8)):
            mlp = LayerNormMLP(intermediate_dim=64, activations="swiglu",
                               use_bias=False, norm_type="rmsnorm")
            variables = mlp.init(jax.random.PRNGKey(1), x)
            # run one step so the meta is nontrivial
            def loss_fn(p, q):
                return jnp.sum(mlp.apply(
                    {"params": p, QUANTIZE_META: q}, x).astype(jnp.float32)**2)
            _, gq = jax.grad(loss_fn, argnums=(0, 1))(
                variables["params"], variables[QUANTIZE_META])[1], None
        state = state_with_quantize_meta(
            variables["params"], variables[QUANTIZE_META], step=3)
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(d + "/ckpt", state)
            restored = restore_checkpoint(path)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(state),
                jax.tree_util.tree_leaves_with_path(restored)):
            assert jnp.array_equal(jnp.asarray(a), jnp.asarray(b)), pa

    def test_fp8_payload_roundtrip(self):
        from transformerengine_tpu.quantize.helper import QuantizerFactory
        q = QuantizerFactory.create(te.Float8CurrentScaling(), "x")
        t = q.quantize(jax.random.normal(jax.random.PRNGKey(0), (32, 32)))
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(d + "/t", {
                "rowwise_data": t.rowwise.data,
                "rowwise_scale_inv": t.rowwise.scale_inv})
            r = restore_checkpoint(path)
        assert jnp.array_equal(
            r["rowwise_data"].astype(jnp.float32),
            t.rowwise.data.astype(jnp.float32))
        assert r["rowwise_data"].dtype == t.rowwise.data.dtype


class TestLowPrecAdamCheckpoint:
    def test_adam_state_remainders_roundtrip(self):
        """AdamState with int16 remainder masters + bf16/fp8 scaled
        states survives an orbax save/restore bitwise (reference:
        FusedAdam state_dict with param remainders)."""
        from transformerengine_tpu.optimizers import fused_adam
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        p = {"w": jax.random.normal(jax.random.PRNGKey(0), (16, 16)
                                    ).astype(jnp.bfloat16)}
        opt = fused_adam(1e-2, store_param_remainders=True,
                         exp_avg_dtype=jnp.bfloat16,
                         exp_avg_sq_dtype=float8_e4m3)
        st = opt.init(p)
        g = {"w": jnp.full((16, 16), 0.1)}
        p, st = opt.step(g, st, p)
        flat = {
            "step": st.step, "mu": st.mu["w"],
            "nu_payload": st.nu["w"].payload,
            "nu_scale": st.nu["w"].scale_inv,
            "rem": st.master["w"], "param": p["w"],
        }
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(d + "/adam", flat)
            r = restore_checkpoint(path)
        for k in flat:
            assert r[k].dtype == jnp.asarray(flat[k]).dtype, k
            assert jnp.array_equal(
                jnp.asarray(r[k]).astype(jnp.float32),
                jnp.asarray(flat[k]).astype(jnp.float32)), k


class TestRemat:
    def test_remat_model_matches_no_remat(self):
        import dataclasses
        from transformerengine_tpu.models.llama import LLAMA_TINY, LlamaModel
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 32), 0, 256)
        m1 = LlamaModel(config=LLAMA_TINY)
        m2 = LlamaModel(config=dataclasses.replace(LLAMA_TINY, remat=True))
        v = m1.init(jax.random.PRNGKey(1), tokens)

        def loss(model, v):
            return jnp.sum(model.apply(v, tokens).astype(jnp.float32) ** 2)

        l1, g1 = jax.value_and_grad(lambda v: loss(m1, v))(v)
        l2, g2 = jax.value_and_grad(lambda v: loss(m2, v))(v)
        assert jnp.allclose(l1, l2, rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            assert jnp.allclose(a, b, rtol=1e-4, atol=1e-5)
