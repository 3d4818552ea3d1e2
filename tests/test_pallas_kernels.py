"""Pallas quantize/matmul kernels vs the pure-JAX ground truth
(reference analog: tests/cpp/operator/test_cast_transpose*.cu,
test_cast_mxfp8.cu — kernel vs CPU reference comparisons)."""
import os

import jax
import jax.numpy as jnp
import pytest

import transformerengine_tpu as te
from transformerengine_tpu.ops.gemm import tn_dot
from transformerengine_tpu.ops.quantize_kernels import (
    cast_transpose, mxfp8_quantize_2x)
from transformerengine_tpu.quantize import qmath
from transformerengine_tpu.quantize.dtypes import float8_e4m3
from transformerengine_tpu.quantize.helper import QuantizerFactory
from transformerengine_tpu.quantize.quantizer import QuantizeLayout


class TestCastTranspose:
    def test_matches_qmath(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (256, 256), jnp.float32)
        scale = jnp.float32(3.7).reshape(1)
        row, col, amax = cast_transpose(x, scale, float8_e4m3)
        ref_row, _, ref_amax = qmath.tensor_scale_quantize(
            x, float8_e4m3, scale)
        assert jnp.array_equal(
            row.astype(jnp.float32), ref_row.astype(jnp.float32))
        assert jnp.array_equal(
            col.astype(jnp.float32), ref_row.T.astype(jnp.float32))
        assert jnp.allclose(amax[0], ref_amax)


class TestMXFP8Fused:
    def test_matches_qmath_both_orientations(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (128, 256), jnp.float32) * 7
        row, col, srow, scol = mxfp8_quantize_2x(x)
        ref_r, ref_sr = qmath.mxfp8_quantize(x)
        ref_c, ref_sc = qmath.mxfp8_quantize(x.T)
        assert jnp.array_equal(row.astype(jnp.float32),
                               ref_r.astype(jnp.float32))
        assert jnp.array_equal(srow, ref_sr)
        assert jnp.array_equal(col.astype(jnp.float32),
                               ref_c.astype(jnp.float32))
        assert jnp.array_equal(scol, ref_sc)

    def test_1x_matches_2x_halves(self):
        from transformerengine_tpu.ops.quantize_kernels import (
            mxfp8_quantize_1x)
        x = jax.random.normal(jax.random.PRNGKey(2), (128, 256),
                              jnp.float32) * 5
        row2, col2, srow2, scol2 = mxfp8_quantize_2x(x)
        row1, srow1 = mxfp8_quantize_1x(x, colwise=False)
        col1, scol1 = mxfp8_quantize_1x(x, colwise=True)
        assert jnp.array_equal(row1.astype(jnp.float32),
                               row2.astype(jnp.float32))
        assert jnp.array_equal(srow1, srow2)
        assert jnp.array_equal(col1.astype(jnp.float32),
                               col2.astype(jnp.float32))
        assert jnp.array_equal(scol1, scol2)

    def test_quantizer_single_layout_uses_fused_and_matches(self):
        """quantize(layout=ROWWISE/COLWISE) must equal the corresponding
        half of the 2x path (the fused 1x kernel's contract)."""
        from transformerengine_tpu.quantize.quantizer import QuantizeLayout
        qset = QuantizerFactory.create_set(te.MXFP8BlockScaling())
        x = jax.random.normal(jax.random.PRNGKey(3), (128, 256),
                              jnp.float32) * 3
        both = qset.x.quantize(x)
        rw = qset.x.quantize(x, layout=QuantizeLayout.ROWWISE)
        cw = qset.x.quantize(x, layout=QuantizeLayout.COLWISE)
        assert jnp.array_equal(rw.data.astype(jnp.float32),
                               both.rowwise.data.astype(jnp.float32))
        assert jnp.array_equal(rw.scale_inv, both.rowwise.scale_inv)
        assert jnp.array_equal(cw.data.astype(jnp.float32),
                               both.colwise.data.astype(jnp.float32))
        assert jnp.array_equal(cw.scale_inv, both.colwise.scale_inv)


class TestFusedQuantizerPath:
    """Fused Pallas 2x quantize must be bit-identical to the generic
    two-pass path (forced on/off via TE_TPU_FUSED_QUANTIZE)."""

    @pytest.mark.parametrize("recipe", [
        te.DelayedScaling(amax_history_len=4), te.Float8CurrentScaling(),
        te.MXFP8BlockScaling(), te.NVFP4BlockScaling()])
    def test_bit_identical(self, recipe):
        x = jax.random.normal(jax.random.PRNGKey(0), (128, 256),
                              jnp.float32) * 4
        q = QuantizerFactory.create(recipe, "x")
        os.environ["TE_TPU_FUSED_QUANTIZE"] = "1"
        try:
            t_fused = q.quantize(x)
        finally:
            os.environ["TE_TPU_FUSED_QUANTIZE"] = "0"
        t_ref = q.quantize(x)
        os.environ.pop("TE_TPU_FUSED_QUANTIZE", None)
        for a, b in zip(jax.tree.leaves(t_fused), jax.tree.leaves(t_ref)):
            assert a.shape == b.shape
            assert jnp.array_equal(a.astype(jnp.float32),
                                   b.astype(jnp.float32)), recipe


class TestNVFP4Fused:
    """Fused RHT+cast kernel (ops/quantize_kernels.nvfp4_quantize_2x)
    vs qmath.nvfp4_quantize — bit-exact on the deterministic path
    (reference analog: tests/cpp/operator/test_cast_nvfp4_transpose.cu)."""

    @pytest.mark.parametrize("with_rht", [False, True])
    @pytest.mark.parametrize("shape", [(128, 256), (64, 128), (256, 384)])
    def test_kernel_matches_qmath(self, with_rht, shape):
        from transformerengine_tpu.ops.quantize_kernels import (
            nvfp4_amax_2x, nvfp4_quantize_2x, pick_tile)
        from transformerengine_tpu.quantize.hadamard import (
            apply_rht, rht_matrix_np)
        x = jax.random.normal(jax.random.PRNGKey(3), shape,
                              jnp.float32) * 11
        sign_mask = 0xBEEF
        rht = rht_matrix_np(sign_mask) if with_rht else None
        m, n = shape
        tile = (pick_tile(m, align=16), pick_tile(n, align=128))

        arow, acol = nvfp4_amax_2x(x, rht, tile)
        xt = apply_rht(x.T, sign_mask) if with_rht else x.T
        assert jnp.array_equal(arow, qmath.compute_amax(x))
        assert jnp.array_equal(acol, qmath.compute_amax(xt))

        denom = 6.0 * 448.0
        ts_row = jnp.where(arow > 0, arow / denom, 1.0)
        ts_col = jnp.where(acol > 0, acol / denom, 1.0)
        row, srow, col, scol = nvfp4_quantize_2x(
            x, ts_row, ts_col, rht, tile=tile)
        ref_r, ref_sr, ref_tsr, _ = qmath.nvfp4_quantize(x)
        ref_c, ref_sc, ref_tsc, _ = qmath.nvfp4_quantize(xt)
        assert jnp.array_equal(row.astype(jnp.float32),
                               ref_r.astype(jnp.float32))
        assert jnp.array_equal(srow.astype(jnp.float32),
                               ref_sr.astype(jnp.float32))
        assert jnp.array_equal(col.astype(jnp.float32),
                               ref_c.astype(jnp.float32))
        assert jnp.array_equal(scol.astype(jnp.float32),
                               ref_sc.astype(jnp.float32))
        assert jnp.allclose(ts_row, ref_tsr[0])
        assert jnp.allclose(ts_col, ref_tsc[0])

    @pytest.mark.parametrize("role", ["x", "dgrad"])
    def test_quantizer_fused_path_bit_identical(self, role):
        """NVFP4Quantizer with RHT through the public quantize() API:
        fused on == fused off (deterministic; SR falls back on CPU)."""
        recipe = te.NVFP4BlockScaling()
        q = QuantizerFactory.create(recipe, role)
        x = jax.random.normal(jax.random.PRNGKey(5), (8, 64, 128),
                              jnp.float32) * 3
        os.environ["TE_TPU_FUSED_QUANTIZE"] = "1"
        try:
            t_fused = q.quantize(x)
        finally:
            os.environ["TE_TPU_FUSED_QUANTIZE"] = "0"
        t_ref = q.quantize(x)
        os.environ.pop("TE_TPU_FUSED_QUANTIZE", None)
        if role == "dgrad":
            # stochastic rounding has no interpret-mode PRNG -> the fused
            # path must decline (both sides take the qmath path).
            pass
        for a, b in zip(jax.tree.leaves(t_fused), jax.tree.leaves(t_ref)):
            assert a.shape == b.shape
            assert jnp.array_equal(a.astype(jnp.float32),
                                   b.astype(jnp.float32))


class TestDecodeMatvec:
    """N-tiled Pallas decode GEMM vs the XLA resident-payload dot
    (ops/decode_matmul.py; opt-in TE_TPU_DECODE_MATVEC)."""

    def test_matches_xla_resident_dot(self):
        import os

        from transformerengine_tpu.ops.decode_matmul import decode_tn_matvec
        from transformerengine_tpu.ops.gemm import tn_dot
        from transformerengine_tpu.quantize.tensor import make_scaled_tensor
        from transformerengine_tpu.quantize.scaling_modes import ScalingMode

        m, k, n = 8, 1024, 2048
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (n, k), jnp.float32)
        amax = jnp.max(jnp.abs(w))
        s_inv = (amax / 448.0).reshape(1)
        payload = (w / s_inv).astype(float8_e4m3)
        t = make_scaled_tensor(payload, s_inv,
                               scaling_mode=ScalingMode.CURRENT_TENSOR_SCALING,
                               dq_dtype=jnp.bfloat16, resident=True)
        ref = tn_dot(x, t)
        out = decode_tn_matvec(x, payload, s_inv, block_n=512)
        d = float(jnp.max(jnp.abs(out - ref)))
        mref = float(jnp.max(jnp.abs(ref))) or 1.0
        assert d / mref < 2e-2, (d, mref)
        # gated q_dot path produces the same values
        os.environ["TE_TPU_DECODE_MATVEC"] = "1"
        try:
            out2 = tn_dot(x, t)
        finally:
            os.environ.pop("TE_TPU_DECODE_MATVEC", None)
        d2 = float(jnp.max(jnp.abs(out2 - ref)))
        assert d2 / mref < 2e-2, (d2, mref)


class TestNormCastTranspose:
    """Fused norm + dual-orientation quantize == the unfused chain
    bit-for-bit (reference: common/normalization/ FP8-output fusion)."""

    def test_matches_chain_rmsnorm_and_layernorm(self):
        import jax
        import jax.numpy as jnp
        from transformerengine_tpu.ops.normalization import (
            layernorm_fwd, rmsnorm_fwd)
        from transformerengine_tpu.ops.quantize_kernels import (
            norm_cast_transpose)
        from transformerengine_tpu.quantize import qmath
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        x = jax.random.normal(jax.random.PRNGKey(0), (256, 384),
                              jnp.bfloat16)
        gamma = jax.random.normal(jax.random.PRNGKey(1), (384,),
                                  jnp.bfloat16)
        beta = jax.random.normal(jax.random.PRNGKey(2), (384,),
                                 jnp.bfloat16)
        scale = jnp.asarray([1.7], jnp.float32)

        ln, rs = rmsnorm_fwd(x, gamma, epsilon=1e-6)
        data, _, amax = qmath.tensor_scale_quantize(ln, float8_e4m3,
                                                    scale[0])
        row, col, am, rsig = norm_cast_transpose(
            x, gamma, None, scale, float8_e4m3)
        assert jnp.array_equal(row, data)
        assert jnp.array_equal(col, data.T)
        assert float(am[0]) == float(amax)
        assert jnp.allclose(rsig.reshape(-1), rs, rtol=2e-7)

        ln2, mu2, rs2 = layernorm_fwd(x, gamma, beta, epsilon=1e-6)
        d2, _, a2 = qmath.tensor_scale_quantize(ln2, float8_e4m3, scale[0])
        row2, col2, am2, rsig2, mu = norm_cast_transpose(
            x, gamma, beta, scale, float8_e4m3, norm="layernorm")
        assert jnp.array_equal(row2, d2)
        assert jnp.array_equal(col2, d2.T)
        assert float(am2[0]) == float(a2)
        assert jnp.allclose(mu.reshape(-1), mu2, rtol=2e-7,
                            atol=1e-7)
        assert jnp.allclose(rsig2.reshape(-1), rs2, rtol=2e-7)

    def test_quantize_normed_helper(self):
        import jax
        import jax.numpy as jnp
        import os
        from transformerengine_tpu.quantize.quantizer import (
            DelayedScaleQuantizer, QuantizeLayout)
        from transformerengine_tpu.quantize.scaling_modes import ScalingMode
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        from transformerengine_tpu.ops.normalization import rmsnorm_fwd
        q = DelayedScaleQuantizer(
            q_dtype=jnp.dtype(float8_e4m3),
            scaling_mode=ScalingMode.DELAYED_TENSOR_SCALING,
            q_layout=QuantizeLayout.ROWWISE_COLWISE,
            scale=jnp.asarray([2.0], jnp.float32))
        x = jax.random.normal(jax.random.PRNGKey(3), (256, 256),
                              jnp.bfloat16)
        gamma = jnp.ones((256,), jnp.bfloat16)
        os.environ["TE_TPU_FUSED_LN_QUANTIZE"] = "1"
        try:
            out = q.quantize_normed(x, gamma, None, norm="rmsnorm",
                                    zero_centered_gamma=False,
                                    epsilon=1e-6)
        finally:
            del os.environ["TE_TPU_FUSED_LN_QUANTIZE"]
        assert out is not None
        q2x, mu, rsigma = out
        ln, rs = rmsnorm_fwd(x, gamma, epsilon=1e-6)
        ref = q.quantize(ln)
        assert jnp.array_equal(q2x.rowwise.data, ref.rowwise.data)
        assert jnp.array_equal(q2x.colwise.data, ref.colwise.data)
        assert mu is None
        assert jnp.allclose(rsigma, rs, rtol=2e-7)


class TestMXFP8QDQGrouped:
    def test_matches_quantize_dequantize_chain(self):
        """Single-pass QDQ+transpose == quantize(swapaxes) -> dequantize
        -> swapaxes, bit-for-bit (the plain-step grouped workspace)."""
        import jax
        import jax.numpy as jnp
        from transformerengine_tpu.ops.quantize_kernels import (
            mxfp8_qdq_2x_grouped)
        from transformerengine_tpu.quantize.quantizer import (
            BlockScaleQuantizer, QuantizeLayout)
        from transformerengine_tpu.quantize.scaling_modes import ScalingMode
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        k = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 128),
                              jnp.bfloat16)
        q = BlockScaleQuantizer(
            q_dtype=jnp.dtype(float8_e4m3),
            scaling_mode=ScalingMode.MXFP8_1D_SCALING,
            q_layout=QuantizeLayout.ROWWISE)
        qt = q.quantize(jnp.swapaxes(k, 1, 2), layout=QuantizeLayout.ROWWISE)
        tn_ref = qt.dequantize().astype(jnp.bfloat16)
        nn_ref = jnp.swapaxes(tn_ref, 1, 2)
        nn, tn = mxfp8_qdq_2x_grouped(k)
        assert jnp.array_equal(tn, tn_ref)
        assert jnp.array_equal(nn, nn_ref)
