"""Numerics tests for the quantization foundation.

Mirrors the reference's kernel-vs-CPU-reference strategy
(tests/cpp/operator/test_cast_*.cu, tests/pytorch/references/): every
scaling mode round-trips within its format's error envelope, block
scale layouts are exact, and delayed-scaling state updates follow the
amax-history semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transformerengine_tpu as te
from transformerengine_tpu.quantize import qmath
from transformerengine_tpu.quantize.dtypes import (
    dtype_max, float4_e2m1, float8_e4m3, float8_e5m2, float8_e8m0)
from transformerengine_tpu.quantize.hadamard import (
    apply_rht, apply_rht_inverse, rht_matrix)
from transformerengine_tpu.quantize.quantizer import QuantizeLayout
from transformerengine_tpu.quantize.scaling_modes import ScalingMode


def rand(key, shape, scale=4.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


def rel_err(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.abs(a - b).mean() / (np.abs(b).mean() + 1e-8)


class TestPerTensor:
    def test_current_scale_roundtrip(self):
        x = rand(0, (64, 128))
        data, s_inv, amax = qmath.current_scale_quantize(x, float8_e4m3)
        out = data.astype(jnp.float32) * s_inv[0]
        assert rel_err(out, x) < 0.04  # e4m3 has ~2^-3 relative step
        np.testing.assert_allclose(amax, jnp.abs(x).max(), rtol=1e-6)

    def test_scale_from_amax_guards(self):
        assert qmath.compute_scale_from_amax(0.0, float8_e4m3) == 1.0
        assert qmath.compute_scale_from_amax(jnp.inf, float8_e4m3) == 1.0
        s = qmath.compute_scale_from_amax(2.0, float8_e4m3)
        np.testing.assert_allclose(s, 224.0)

    def test_e5m2_coarser(self):
        x = rand(1, (64, 128))
        d3, s3, _ = qmath.current_scale_quantize(x, float8_e4m3)
        d2, s2, _ = qmath.current_scale_quantize(x, float8_e5m2)
        e3 = rel_err(d3.astype(jnp.float32) * s3[0], x)
        e2 = rel_err(d2.astype(jnp.float32) * s2[0], x)
        assert e3 < e2


class TestMXFP8:
    def test_roundtrip(self):
        x = rand(2, (32, 256))
        data, scale = qmath.mxfp8_quantize(x)
        # e8m0 bits stored as biased-exponent uint8 (no TPU e8m0 dtype)
        assert scale.dtype == jnp.dtype(jnp.uint8)
        assert scale.shape == (32, 8)
        s = ScalingMode.MXFP8_1D_SCALING.decode_scale_inv(scale)
        out = data.astype(jnp.float32).reshape(32, 8, 32) * s[..., None]
        assert rel_err(out.reshape(32, 256), x) < 0.04

    def test_scales_are_pow2(self):
        x = rand(12, (8, 64))
        _, scale = qmath.mxfp8_quantize(x)
        s = np.asarray(ScalingMode.MXFP8_1D_SCALING.decode_scale_inv(scale))
        np.testing.assert_allclose(np.log2(s), np.round(np.log2(s)), atol=1e-6)

    def test_no_overflow(self):
        # Values exactly at the block amax must stay finite after scaling.
        x = jnp.full((4, 32), 123456.0, jnp.float32)
        data, scale = qmath.mxfp8_quantize(x)
        assert np.isfinite(data.astype(jnp.float32)).all()

    def test_wide_dynamic_range(self):
        # Per-block scaling preserves blocks that differ by 2^20.
        a = jnp.ones((1, 32), jnp.float32)
        b = jnp.ones((1, 32), jnp.float32) * 2.0 ** 20
        x = jnp.concatenate([a, b], axis=1)
        data, scale = qmath.mxfp8_quantize(x)
        s = ScalingMode.MXFP8_1D_SCALING.decode_scale_inv(scale)
        out = data.astype(jnp.float32).reshape(1, 2, 32) * s[..., None]
        np.testing.assert_allclose(out.reshape(1, 64), x, rtol=1e-6)


class TestBlockScaling:
    @pytest.mark.parametrize("pow2", [True, False])
    def test_1d_roundtrip(self, pow2):
        x = rand(3, (64, 256))
        data, s_inv = qmath.block_quantize(x, float8_e4m3, 1, 128, pow2)
        assert s_inv.shape == (64, 2)
        out = data.astype(jnp.float32).reshape(64, 2, 128) * s_inv[..., None]
        assert rel_err(out.reshape(64, 256), x) < 0.05

    def test_2d_roundtrip(self):
        x = rand(4, (256, 256))
        data, s_inv = qmath.block_quantize(x, float8_e4m3, 128, 128, True)
        assert s_inv.shape == (2, 2)
        s = jnp.repeat(jnp.repeat(s_inv, 128, 0), 128, 1)
        out = data.astype(jnp.float32) * s
        assert rel_err(out, x) < 0.05

    def test_pow2_scales_are_pow2(self):
        x = rand(5, (32, 128))
        _, s_inv = qmath.block_quantize(x, float8_e4m3, 1, 128, True)
        logs = np.log2(np.asarray(s_inv))
        np.testing.assert_allclose(logs, np.round(logs), atol=1e-6)


class TestNVFP4:
    def test_roundtrip(self):
        from transformerengine_tpu.quantize.dtypes import FP4_GRID, FP4_STORAGE_DTYPE
        x = rand(6, (32, 128), scale=2.0)
        data, bs, ts_inv, amax = qmath.nvfp4_quantize(x)
        # fp4 payload stored in an e4m3 byte, values on the e2m1 grid
        assert data.dtype == jnp.dtype(FP4_STORAGE_DTYPE)
        grid = {abs(v) for v in FP4_GRID}
        assert set(np.unique(np.abs(np.asarray(data.astype(jnp.float32))))) <= grid
        assert bs.dtype == jnp.dtype(float8_e4m3)
        assert bs.shape == (32, 8)
        out = (data.astype(jnp.float32).reshape(32, 8, 16)
               * bs.astype(jnp.float32)[..., None]) * ts_inv[0]
        # FP4 is coarse: ~25% mean relative error envelope for gaussians.
        assert rel_err(out.reshape(32, 128), x) < 0.30

    def test_zero_tensor(self):
        x = jnp.zeros((16, 64), jnp.float32)
        data, bs, ts_inv, amax = qmath.nvfp4_quantize(x)
        assert np.all(np.asarray(data.astype(jnp.float32)) == 0)

    def test_rht_orthogonal(self):
        for mask in (0, 0xBEEF):
            m = rht_matrix(mask)
            np.testing.assert_allclose(np.asarray(m @ m.T), np.eye(16), atol=1e-5)
        x = rand(7, (8, 64))
        y = apply_rht_inverse(apply_rht(x, 0x123), 0x123)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)

    def test_rht_reduces_outlier_amax(self):
        x = jnp.zeros((4, 64), jnp.float32).at[1, 17].set(100.0)
        y = apply_rht(x, 0)
        assert jnp.abs(y).max() < jnp.abs(x).max()


class TestStochasticRounding:
    def test_unbiased(self):
        # A value exactly between two fp8 grid points should round up
        # about half the time.
        lo, hi = 320.0, 352.0  # adjacent e4m3 values
        x = jnp.full((200, 128), (lo + hi) / 2, jnp.float32)
        out = qmath.stochastic_cast(x, float8_e4m3, jax.random.PRNGKey(0))
        vals = np.asarray(out.astype(jnp.float32))
        frac_up = (vals == hi).mean()
        assert set(np.unique(vals)) <= {lo, hi}
        assert 0.4 < frac_up < 0.6

    def test_exact_values_unchanged(self):
        x = jnp.asarray([[1.0, 2.0, -4.0, 448.0] * 32], jnp.float32)
        out = qmath.stochastic_cast(x, float8_e4m3, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)),
                                      np.asarray(x))


class TestQuantizers:
    @pytest.mark.parametrize("mode,cls_kwargs", [
        (ScalingMode.CURRENT_TENSOR_SCALING, {}),
        (ScalingMode.MXFP8_1D_SCALING, {}),
        (ScalingMode.BLOCK_SCALING_1D, {}),
    ])
    def test_2x_quantize_consistency(self, mode, cls_kwargs):
        """Colwise dequantize == transpose of the original (within format
        error), for each mode."""
        from transformerengine_tpu.quantize.quantizer import (
            BlockScaleQuantizer, CurrentScaleQuantizer)
        x = rand(8, (64, 256))
        if mode is ScalingMode.CURRENT_TENSOR_SCALING:
            q = CurrentScaleQuantizer(q_dtype=jnp.dtype(float8_e4m3),
                                      scaling_mode=mode,
                                      q_layout=QuantizeLayout.ROWWISE_COLWISE)
        else:
            q = BlockScaleQuantizer(q_dtype=jnp.dtype(float8_e4m3),
                                    scaling_mode=mode,
                                    q_layout=QuantizeLayout.ROWWISE_COLWISE)
        t = q.quantize(x)
        rw = t.rowwise.dequantize()
        cw = t.colwise.dequantize()
        assert rw.shape == (64, 256)
        assert cw.shape == (256, 64)
        assert rel_err(rw, x) < 0.05
        assert rel_err(cw, x.T) < 0.05
        if mode is ScalingMode.CURRENT_TENSOR_SCALING:
            np.testing.assert_array_equal(np.asarray(rw).T, np.asarray(cw))

    def test_nd_flatten_axis(self):
        from transformerengine_tpu.quantize.quantizer import CurrentScaleQuantizer
        x = rand(9, (4, 16, 32))
        q = CurrentScaleQuantizer(
            q_dtype=jnp.dtype(float8_e4m3),
            scaling_mode=ScalingMode.CURRENT_TENSOR_SCALING,
            q_layout=QuantizeLayout.ROWWISE_COLWISE)
        t = q.quantize(x)
        assert t.rowwise.data.shape == (4, 16, 32)
        assert t.colwise.data.shape == (32, 4, 16)

    def test_delayed_scaling_state_machine(self):
        from transformerengine_tpu.quantize.quantizer import DelayedScaleQuantizer
        q = DelayedScaleQuantizer(
            q_dtype=jnp.dtype(float8_e4m3),
            scaling_mode=ScalingMode.DELAYED_TENSOR_SCALING,
            q_layout=QuantizeLayout.ROWWISE,
            amax_history=jnp.zeros((4,), jnp.float32))
        # step 1: scale starts at 1; quantize records amax; update sets scale
        x = rand(10, (16, 32), scale=2.0)
        t = q.quantize(x)
        np.testing.assert_allclose(np.asarray(t.scale_inv), [1.0])
        q2 = q.update(t.amax)
        expected = float(qmath.compute_scale_from_amax(jnp.abs(x).max(), float8_e4m3))
        np.testing.assert_allclose(np.asarray(q2.scale), [expected], rtol=1e-6)
        # history: rolled, slot 0 zeroed, recorded amax now at the end
        assert q2.amax_history[0] == 0.0
        np.testing.assert_allclose(float(q2.amax_history[-1]),
                                   float(jnp.abs(x).max()), rtol=1e-6)
        # quantizer is jit-compatible pytree state
        t2 = jax.jit(lambda qq, xx: qq.quantize(xx))(q2, x)
        assert rel_err(t2.dequantize(), x) < 0.04

    def test_quantize_under_jit_and_grad(self):
        from transformerengine_tpu.quantize.quantizer import CurrentScaleQuantizer
        q = CurrentScaleQuantizer(
            q_dtype=jnp.dtype(float8_e4m3),
            scaling_mode=ScalingMode.CURRENT_TENSOR_SCALING,
            q_layout=QuantizeLayout.ROWWISE)

        @jax.jit
        def f(x):
            return q.quantize(x).dequantize().sum()

        f(rand(11, (8, 32)))  # must trace & compile


class TestFactory:
    @pytest.mark.parametrize("recipe,expected_mode", [
        (te.DelayedScaling(), ScalingMode.DELAYED_TENSOR_SCALING),
        (te.Float8CurrentScaling(), ScalingMode.CURRENT_TENSOR_SCALING),
        (te.MXFP8BlockScaling(), ScalingMode.MXFP8_1D_SCALING),
        (te.Float8BlockScaling(), ScalingMode.BLOCK_SCALING_1D),
        (te.NVFP4BlockScaling(), ScalingMode.NVFP4_1D_SCALING),
    ])
    def test_create_set(self, recipe, expected_mode):
        qs = te.QuantizerFactory.create_set(recipe)
        assert qs.x.scaling_mode == expected_mode
        assert qs.dgrad is not None

    def test_hybrid_formats(self):
        qs = te.QuantizerFactory.create_set(te.DelayedScaling(fp8_format=te.HYBRID))
        assert qs.x.q_dtype == jnp.dtype(float8_e4m3)
        assert qs.dgrad.q_dtype == jnp.dtype(float8_e5m2)

    def test_blockwise_weight_2d(self):
        qs = te.QuantizerFactory.create_set(te.Float8BlockScaling())
        assert qs.kernel.scaling_mode == ScalingMode.BLOCK_SCALING_2D
        assert qs.x.scaling_mode == ScalingMode.BLOCK_SCALING_1D

    def test_autocast_context(self):
        assert not te.is_quantize_enabled()
        with te.autocast(enabled=True, recipe=te.MXFP8BlockScaling()):
            assert te.is_quantize_enabled()
            qs = te.QuantizerFactory.create_set()
            assert qs.x.scaling_mode == ScalingMode.MXFP8_1D_SCALING
        assert not te.is_quantize_enabled()
        qs = te.QuantizerFactory.create_set()
        assert qs.x is None


class TestNVFP42D:
    """QParams.fp4_2d_quantization weight mode (reference:
    recipe/__init__.py:77, 16x16 two-level blocks)."""

    def test_2d_weight_mode_roundtrip(self):
        import dataclasses
        import transformerengine_tpu as te
        from transformerengine_tpu.common.recipe import QParams
        from transformerengine_tpu.quantize.helper import QuantizerFactory
        recipe = dataclasses.replace(
            te.NVFP4BlockScaling(),
            fp4_quant_fwd_weight=QParams(fp4_2d_quantization=True))
        q = QuantizerFactory.create(recipe, "kernel")
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 64)) * 0.3
        t = q.quantize(w)
        assert t.rowwise.scale_inv.shape == (4, 4)
        rel = float(jnp.max(jnp.abs(t.rowwise.dequantize() - w))
                    / jnp.max(jnp.abs(w)))
        assert rel < 0.25
        # 1D input quantizer unchanged
        qx = QuantizerFactory.create(recipe, "x")
        tx = qx.quantize(w)
        assert tx.rowwise.scale_inv.shape == (64, 4)


class TestNVFP44over6:
    """Four Over Six adaptive block scaling (reference:
    cast/nvfp4/quantize_4over6_nvfp4.cuh)."""

    def test_never_worse_than_plain(self):
        from transformerengine_tpu.quantize import qmath
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 64)) * 3
        d6, s6, t6, _ = qmath.nvfp4_quantize(x)
        d46, s46, t46, _ = qmath.nvfp4_quantize(x, four_over_six=True)

        def err(d, s, t):
            from transformerengine_tpu.quantize.tensor import make_scaled_tensor
            from transformerengine_tpu.quantize.scaling_modes import ScalingMode
            tt = make_scaled_tensor(d, s, scaling_mode=ScalingMode.NVFP4_1D_SCALING,
                                    dq_dtype=jnp.float32, tensor_scale_inv=t)
            return float(jnp.mean(jnp.square(tt.dequantize() - x)))

        assert err(d46, s46, t46) <= err(d6, s6, t6) * 1.0001

    def test_recipe_plumbing(self):
        import dataclasses
        import transformerengine_tpu as te
        from transformerengine_tpu.quantize.helper import QuantizerFactory
        r = dataclasses.replace(te.NVFP4BlockScaling(), nvfp4_4over6="weights")
        qw = QuantizerFactory.create(r, "kernel")
        qx = QuantizerFactory.create(r, "x")
        assert qw.four_over_six and not qx.four_over_six
