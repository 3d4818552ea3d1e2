"""Flex attention, graph-capture alias, HLO collective counting, RoPE,
prequantized weights, export utilities."""
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import transformerengine_tpu as te
from transformerengine_tpu.attention import AttnBackend, AttnMaskType, fused_attn
from transformerengine_tpu.flex_attention import (
    alibi_mod, causal_mask_mod, flex_attention, soft_cap_mod)
from transformerengine_tpu.graph import make_graphed_callables
from transformerengine_tpu.ops.rope import apply_rope, rope_frequencies
from transformerengine_tpu.utils.hlo_checks import (
    assert_collective_counts, count_collectives)


class TestFlexAttention:
    def test_causal_matches_fused(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 4, 64))
        out = flex_attention(q, q, q, mask_mod=causal_mask_mod)
        ref = fused_attn((q, q, q), attn_mask_type=AttnMaskType.CAUSAL,
                         backend=AttnBackend.UNFUSED)
        assert jnp.max(jnp.abs(out - ref)) < 1e-5

    def test_soft_cap_grads(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 32))
        f = lambda q: jnp.sum(flex_attention(
            q, q, q, score_mod=soft_cap_mod(30.0),
            mask_mod=causal_mask_mod) ** 2)
        g = jax.grad(f)(q)
        assert jnp.all(jnp.isfinite(g))

    def test_alibi(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 16))
        slopes = jnp.array([0.5, 0.25])
        out = flex_attention(q, q, q, score_mod=alibi_mod(slopes))
        assert out.shape == q.shape

    def test_chunked_matches_reference_gqa(self):
        """Default (chunked O(S) memory) impl == direct materialization,
        with a score mod + causal mask and grouped-query heads."""
        kq = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(kq[0], (2, 48, 4, 32))
        k = jax.random.normal(kq[1], (2, 48, 2, 32))
        v = jax.random.normal(kq[2], (2, 48, 2, 32))
        slopes = jnp.array([0.5, 0.25, 0.125, 0.0625])
        out = flex_attention(q, k, v, score_mod=alibi_mod(slopes),
                             mask_mod=causal_mask_mod, impl="chunked",
                             block_k=128)
        ref = flex_attention(q, k, v, score_mod=alibi_mod(slopes),
                             mask_mod=causal_mask_mod, impl="reference")
        assert jnp.max(jnp.abs(out - ref)) < 1e-5

    def test_chunked_grads_include_mod_params(self):
        """Chunked path backprops into q/k/v AND into parameters captured
        by the score_mod closure (relative bias table)."""
        from transformerengine_tpu.flex_attention import (
            relative_position_bias_mod)
        keys = jax.random.split(jax.random.PRNGKey(2), 4)
        q = jax.random.normal(keys[0], (1, 32, 2, 16))
        k = jax.random.normal(keys[1], (1, 32, 2, 16))
        v = jax.random.normal(keys[2], (1, 32, 2, 16))
        table = 0.1 * jax.random.normal(keys[3], (2, 9))

        def loss(q, k, v, table, impl):
            o = flex_attention(q, k, v,
                               score_mod=relative_position_bias_mod(table),
                               mask_mod=causal_mask_mod, impl=impl,
                               block_k=128)
            return jnp.sum(o ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, table, "chunked")
        gr = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, table,
                                                  "reference")
        for a, b in zip(g, gr):
            assert jnp.max(jnp.abs(a - b)) < 1e-5
        assert jnp.max(jnp.abs(g[3])) > 0  # table actually gets gradient

    def test_chunked_ragged_kv_padding(self):
        """Skv not a multiple of block_k: padded columns masked out."""
        q = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 2, 16))
        k = jax.random.normal(jax.random.PRNGKey(4), (1, 150, 2, 16))
        v = jax.random.normal(jax.random.PRNGKey(5), (1, 150, 2, 16))
        out = flex_attention(q, k, v, score_mod=soft_cap_mod(20.0),
                             impl="chunked", block_k=128)
        ref = flex_attention(q, k, v, score_mod=soft_cap_mod(20.0),
                             impl="reference")
        assert jnp.max(jnp.abs(out - ref)) < 1e-5

    def test_flash_impl_scoremod_fwd_and_grad(self):
        """impl='flash' traces the mod into the Pallas kernel; fwd and
        q/k/v grads match the reference impl."""
        from transformerengine_tpu.flex_attention import alibi_arith_mod
        keys = jax.random.split(jax.random.PRNGKey(6), 3)
        q = jax.random.normal(keys[0], (1, 64, 4, 32))
        k = jax.random.normal(keys[1], (1, 64, 2, 32))
        v = jax.random.normal(keys[2], (1, 64, 2, 32))
        mod = alibi_arith_mod(4)

        def loss(q, k, v, impl):
            o = flex_attention(q, k, v, score_mod=mod,
                               mask_mod=causal_mask_mod, impl=impl)
            return jnp.sum(o ** 2), o

        (l, o), g = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                       has_aux=True)(q, k, v, "flash")
        (lr, orf), gr = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                          has_aux=True)(q, k, v,
                                                        "reference")
        assert jnp.max(jnp.abs(o - orf)) < 2e-2   # bf16 MXU operands
        for a, b in zip(g, gr):
            assert jnp.max(jnp.abs(a - b)) < 2e-2

    def test_flash_kernel_softcap(self):
        """score_mod straight through ops.flash_attention vs unfused."""
        from transformerengine_tpu.ops.flash_attention import (
            flash_attention as flash)
        q = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 4, 32))
        cap = soft_cap_mod(15.0)
        out = flash(q, q, q, attn_mask_type=AttnMaskType.CAUSAL,
                    score_mod=cap)
        ref = flex_attention(q, q, q, score_mod=cap,
                             mask_mod=causal_mask_mod, impl="reference")
        assert jnp.max(jnp.abs(out - ref)) < 2e-2


class TestGraphAlias:
    def test_precompiles_and_runs(self):
        def f(x):
            return x * 2 + 1
        x = jnp.ones((4,))
        g = make_graphed_callables(f, (x,))
        assert jnp.allclose(g(x), x * 2 + 1)

    def test_multiple(self):
        fs = make_graphed_callables(
            [lambda x: x + 1, lambda x: x * 3],
            [(jnp.ones(2),), (jnp.ones(2),)])
        assert jnp.allclose(fs[0](jnp.ones(2)), 2)
        assert jnp.allclose(fs[1](jnp.ones(2)), 3)


class TestHLOChecks:
    def test_counts_psum_in_shard_map(self):
        mesh = Mesh(mesh_utils.create_device_mesh((4,), jax.devices()[:4]),
                    ("x",))

        def fn(v):
            return jax.shard_map(lambda a: jax.lax.psum(a, "x"),
                                 mesh=mesh, in_specs=P("x"), out_specs=P(),
                                 check_vma=False)(v)

        counts = assert_collective_counts(fn, {"all-reduce": 1},
                                          jnp.ones((8, 4)))
        assert counts.get("all-gather", 0) == 0


class TestRoPE:
    def test_rotation_preserves_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 4, 64))
        freqs = rope_frequencies(64, 32)
        out = apply_rope(x, freqs)
        assert jnp.allclose(
            jnp.linalg.norm(out, axis=-1), jnp.linalg.norm(x, axis=-1),
            atol=1e-4)

    def test_positions_offset_matches_slice(self):
        """RoPE with explicit positions == RoPE of the full sequence."""
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 32))
        freqs = rope_frequencies(32, 64)
        full = apply_rope(x, freqs)
        positions = jnp.arange(16)[None, :]
        explicit = apply_rope(x, freqs, positions=positions)
        assert jnp.allclose(full, explicit, atol=1e-6)
        # decode-style: rotate position 7 alone
        one = apply_rope(x[:, 7:8], freqs, positions=jnp.array([[7]]))
        assert jnp.allclose(one[0, 0], full[0, 7], atol=1e-6)

    def test_interleaved_differs(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 1, 16))
        freqs = rope_frequencies(16, 8)
        a = apply_rope(x, freqs)
        b = apply_rope(x, freqs, interleaved=True)
        assert not jnp.allclose(a, b)


class TestPrequant:
    def test_generation_matches_bf16(self):
        from transformerengine_tpu.inference import generate
        from transformerengine_tpu.models.llama import LLAMA_TINY, LlamaModel
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        from transformerengine_tpu.quantize.prequant import prequantize_kernels
        model = LlamaModel(config=LLAMA_TINY)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 1, 256)
        lengths = jnp.full((2,), 16, jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), tokens)
        ref = generate(model, variables, tokens, lengths, 4)
        pvars = prequantize_kernels(variables, te.Float8CurrentScaling())
        out = generate(model, pvars, tokens, lengths, 4,
                       kv_cache_dtype=float8_e4m3)
        assert (ref == out).mean() > 0.7  # fp8 may flip rare near-ties

    def test_kn_block_resident_nvfp4_matches_dequant_reference(self):
        """Block-scaled recipes prequantize to the contraction-major
        (K, N) BlockResidentKernel; the fwd GEMM must equal the plain
        dequantize-then-dot on the SAME quantized values."""
        from transformerengine_tpu.quantize.helper import QuantizerFactory
        from transformerengine_tpu.quantize.prequant import (
            BlockResidentKernel, prequantize_kernel_array)
        from transformerengine_tpu.quantize.quantizer import QuantizeLayout
        for recipe in (te.NVFP4BlockScaling(), te.MXFP8BlockScaling()):
            k = jax.random.normal(jax.random.PRNGKey(0), (128, 64),
                                  jnp.bfloat16)
            x = jax.random.normal(jax.random.PRNGKey(1), (4, 128),
                                  jnp.bfloat16)
            import os
            os.environ["TE_TPU_BLOCK_DECODE"] = "quantized"
            try:
                pk = prequantize_kernel_array(k, recipe)
            finally:
                del os.environ["TE_TPU_BLOCK_DECODE"]
            assert isinstance(pk.colwise, BlockResidentKernel), recipe
            q = QuantizerFactory.create(recipe, "kernel",
                                        QuantizeLayout.COLWISE)
            qt = q.quantize(k, dq_dtype=jnp.bfloat16)
            ref = (x.astype(jnp.float32)
                   @ qt.dequantize().astype(jnp.float32).T)
            import os
            os.environ["TE_TPU_PREQUANT_X_QUANT"] = "0"
            try:
                out = te.dense(x, pk)
            finally:
                del os.environ["TE_TPU_PREQUANT_X_QUANT"]
            assert jnp.max(jnp.abs(out - ref)) < 2e-2 * (
                1 + jnp.max(jnp.abs(ref))), recipe

    def test_kn_packed_nibbles_match_unpacked(self):
        """Split-plane nibble packing stores the SAME e2m1 values in
        half the bytes; fwd outputs must agree (only the K-halves dot
        split reorders the f32 accumulation)."""
        import os
        from transformerengine_tpu.quantize.prequant import (
            prequantize_kernel_array)
        k = jax.random.normal(jax.random.PRNGKey(0), (256, 128),
                              jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 256), jnp.bfloat16)
        outs = {}
        for pack in ("0", "1"):
            os.environ["TE_TPU_PREQUANT_PACK4"] = pack
            os.environ["TE_TPU_PREQUANT_X_QUANT"] = "0"
            os.environ["TE_TPU_BLOCK_DECODE"] = "quantized"
            try:
                pk = prequantize_kernel_array(k, te.NVFP4BlockScaling())
                assert pk.colwise.packed == (pack == "1")
                if pack == "1":
                    assert pk.colwise.payload.shape == (128, 128)
                    assert pk.colwise.payload.dtype == jnp.uint8
                outs[pack] = te.dense(x, pk)
            finally:
                del os.environ["TE_TPU_PREQUANT_PACK4"]
                del os.environ["TE_TPU_PREQUANT_X_QUANT"]
                del os.environ["TE_TPU_BLOCK_DECODE"]
        assert jnp.allclose(outs["0"], outs["1"], atol=1e-3, rtol=1e-3)

    def test_e2m1_code_e4m3_roundtrip(self):
        """The arithmetic code<->byte maps are exact inverses over all
        16 e2m1 codes, and the bytes decode to the e2m1 value grid."""
        import numpy as np
        from transformerengine_tpu.ops.decode_matmul import (
            _e2m1_code_to_e4m3_bits)
        from transformerengine_tpu.quantize.prequant import (
            _e4m3_bits_to_e2m1_code)
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        codes = jnp.arange(16, dtype=jnp.int32).reshape(1, 16)
        bits = _e2m1_code_to_e4m3_bits(codes)
        back = _e4m3_bits_to_e2m1_code(bits.astype(jnp.uint8))
        assert jnp.array_equal(back, codes)
        vals = jax.lax.bitcast_convert_type(
            bits.astype(jnp.uint8), jnp.dtype(float8_e4m3)).astype(
            jnp.float32).reshape(-1)
        grid = np.array([0, .5, 1, 1.5, 2, 3, 4, 6])
        expect = np.concatenate([grid, -grid])
        assert np.array_equal(np.asarray(vals), expect)

    def test_kn_decode_matvec_kernel_parity(self):
        """Forced decode_kn_matvec (interpret mode) matches the XLA
        fallback bit-for-bit on the packed AND unpacked storages."""
        import os
        from transformerengine_tpu.ops.gemm import block_resident_dot
        from transformerengine_tpu.quantize.prequant import (
            prequantize_kernel_array)
        k = jax.random.normal(jax.random.PRNGKey(2), (1024, 1024),
                              jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(3), (8, 1024), jnp.bfloat16)
        for pack in ("0", "1"):
            os.environ["TE_TPU_PREQUANT_PACK4"] = pack
            os.environ["TE_TPU_BLOCK_DECODE"] = "quantized"
            try:
                pk = prequantize_kernel_array(k, te.NVFP4BlockScaling())
            finally:
                del os.environ["TE_TPU_PREQUANT_PACK4"]
                del os.environ["TE_TPU_BLOCK_DECODE"]
            ref = block_resident_dot(x, pk.colwise)
            os.environ["TE_TPU_DECODE_MATVEC"] = "1"
            try:
                out = block_resident_dot(x, pk.colwise)
            finally:
                del os.environ["TE_TPU_DECODE_MATVEC"]
            assert jnp.allclose(out, ref, atol=2e-2, rtol=1e-2), pack

    def test_block_recipe_bf16_default_matches_recipe_values(self):
        """Default block-recipe prequantization (TE_TPU_BLOCK_DECODE=
        bf16) stores the EXACT recipe-snapped values dequantized once
        at load — the fast decode representation on v5e (see
        quantize/prequant.py measurement notes)."""
        from transformerengine_tpu.quantize.helper import QuantizerFactory
        from transformerengine_tpu.quantize.prequant import (
            prequantize_kernel_array)
        from transformerengine_tpu.quantize.quantizer import QuantizeLayout
        k = jax.random.normal(jax.random.PRNGKey(0), (128, 64),
                              jnp.bfloat16)
        pk = prequantize_kernel_array(k, te.NVFP4BlockScaling())
        assert isinstance(pk.colwise, jax.Array)
        assert pk.colwise.dtype == jnp.bfloat16
        q = QuantizerFactory.create(te.NVFP4BlockScaling(), "kernel",
                                    QuantizeLayout.COLWISE)
        ref = q.quantize(k, dq_dtype=jnp.bfloat16).dequantize()
        assert jnp.array_equal(pk.colwise, ref.astype(jnp.bfloat16))

    def test_quantized_capacity_mode_generation(self):
        """TE_TPU_BLOCK_DECODE=quantized + nibble packing end to end:
        generation runs off the 0.5-byte resident payloads and stays
        close to the bf16-resident default (same NVFP4 values, dequant
        in VMEM vs at load)."""
        import os
        from transformerengine_tpu.inference import generate
        from transformerengine_tpu.models.llama import (
            LLAMA_TINY, LlamaModel)
        from transformerengine_tpu.quantize.prequant import (
            BlockResidentKernel, prequantize_kernels)
        model = LlamaModel(config=LLAMA_TINY)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 1, 200)
        lengths = jnp.full((2,), 16, jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), tokens)
        pv_bf16 = prequantize_kernels(variables, te.NVFP4BlockScaling())
        ref = generate(model, pv_bf16, tokens, lengths, 4)
        os.environ["TE_TPU_BLOCK_DECODE"] = "quantized"
        os.environ["TE_TPU_PREQUANT_PACK4"] = "1"
        try:
            pv_q = prequantize_kernels(variables, te.NVFP4BlockScaling())
            leaves = jax.tree.leaves(
                pv_q["prequant"],
                is_leaf=lambda x: isinstance(x, BlockResidentKernel))
            assert any(isinstance(l, BlockResidentKernel) and l.packed
                       for l in leaves)
            out = generate(model, pv_q, tokens, lengths, 4)
        finally:
            del os.environ["TE_TPU_BLOCK_DECODE"]
            del os.environ["TE_TPU_PREQUANT_PACK4"]
        # identical NVFP4 values; only f32 accumulation order differs
        assert (ref == out).mean() > 0.7, (ref, out)

    def test_training_through_prequant_raises(self):
        from transformerengine_tpu.quantize.prequant import (
            prequantize_kernel_array)
        k = jax.random.normal(jax.random.PRNGKey(0), (32, 16))
        pk = prequantize_kernel_array(k, te.Float8CurrentScaling())
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
        out = te.dense(x, pk)          # fwd works
        assert out.shape == (4, 16)
        with pytest.raises(NotImplementedError, match="PrequantizedKernel"):
            jax.grad(lambda x: jnp.sum(te.dense(x, pk)))(x)


class TestExport:
    def test_stablehlo_roundtrip(self):
        from transformerengine_tpu.utils.export import (
            export_stablehlo, import_stablehlo)
        f = lambda x: jnp.sin(x) * 2
        x = jnp.linspace(0, 1, 8)
        blob = export_stablehlo(f, x)
        assert isinstance(blob, (bytes, bytearray))
        g = import_stablehlo(bytes(blob))
        assert jnp.allclose(g(x), f(x))

    def test_dequantize_pytree(self):
        from transformerengine_tpu.quantize.helper import QuantizerFactory
        from transformerengine_tpu.utils.export import dequantize_pytree
        q = QuantizerFactory.create(te.Float8CurrentScaling(), "x")
        t = q.quantize(jax.random.normal(jax.random.PRNGKey(0), (16, 16)))
        tree = {"w": t.rowwise, "b": jnp.ones(3)}
        out = dequantize_pytree(tree)
        assert out["w"].dtype == jnp.bfloat16
        assert out["w"].shape == (16, 16)


class TestAttentionHelpers:
    """Reference-parity attention utilities (reference: jax/attention.py
    make_swa_mask :236, canonicalize_attn_mask_type :295,
    is_fused_attn_kernel_available :326, reorder_causal_load_balancing
    :388)."""

    def test_canonicalize_attn_mask_type(self):
        from transformerengine_tpu.attention import (
            canonicalize_attn_mask_type)
        assert canonicalize_attn_mask_type("causal") is AttnMaskType.CAUSAL
        assert (canonicalize_attn_mask_type("PADDING_CAUSAL")
                is AttnMaskType.PADDING_CAUSAL)
        assert (canonicalize_attn_mask_type("bottom_right_causal")
                is AttnMaskType.CAUSAL_BOTTOM_RIGHT)
        with pytest.raises(ValueError):
            canonicalize_attn_mask_type("nope")

    def test_make_swa_mask_matches_attention_mask(self):
        from transformerengine_tpu.attention import (
            make_attention_mask, make_swa_mask)
        sq, skv, win = 16, 16, (5, 2)
        pos = jnp.broadcast_to(jnp.arange(sq), (2, sq))
        swa = make_swa_mask(pos, pos, win)
        assert swa.shape == (2, 1, sq, skv)
        full = make_attention_mask(None, AttnMaskType.NO_MASK, sq, skv, 2,
                                   window_size=win)
        assert jnp.array_equal(swa.astype(bool), full)
        # negative bounds = unbounded
        allow = make_swa_mask(pos, pos, (-1, -1))
        assert bool(jnp.all(allow == 1.0))

    def test_is_fused_attn_kernel_available(self):
        from transformerengine_tpu.attention import (
            AttnBiasType, is_fused_attn_kernel_available)
        assert is_fused_attn_kernel_available(
            attn_mask_type=AttnMaskType.CAUSAL, head_dim=128)
        assert not is_fused_attn_kernel_available(
            attn_bias_type=AttnBiasType.PRE_SCALE_BIAS)
        assert not is_fused_attn_kernel_available(head_dim=100)

    @pytest.mark.parametrize("strategy", ["dual", "striped", "striped4"])
    def test_reorder_causal_load_balancing_roundtrip(self, strategy):
        from transformerengine_tpu.attention import (
            ReorderStrategy, inverse_reorder_causal_load_balancing,
            reorder_causal_load_balancing)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 3))
        st = (ReorderStrategy.DUAL_CHUNK_SWAP if strategy == "dual"
              else ReorderStrategy.STRIPED)
        ss = 4 if strategy == "striped4" else None
        y = reorder_causal_load_balancing(x, st, 4, 1, stripe_size=ss)
        assert y.shape == x.shape
        assert not jnp.array_equal(y, x)
        back = inverse_reorder_causal_load_balancing(y, st, 4, 1,
                                                     stripe_size=ss)
        assert jnp.array_equal(back, x)

    def test_striped_stripe_size_groups_tokens(self):
        from transformerengine_tpu.parallel.cp_utils import (
            reorder_causal_striped)
        x = jnp.arange(16)[None, :, None]
        y = reorder_causal_striped(x, 2, 1, stripe_size=2)[0, :, 0]
        # rank0 stripes: [0,1], [4,5], [8,9], [12,13]
        assert list(y[:8]) == [0, 1, 4, 5, 8, 9, 12, 13]

    def test_qkv_format(self):
        from transformerengine_tpu.attention import QKVFormat, QKVLayout
        assert QKVLayout.BS3HD.get_qkv_format() is QKVFormat.BSHD
        assert QKVLayout.THD_THD_THD.get_qkv_format() is QKVFormat.THD


class TestRopeVariants:
    def test_thd_matches_per_sequence(self):
        """apply_rope_thd == apply_rope run on each unpacked sequence
        (reference: nvte_fused_rope_forward thd, fused_rope.h:41)."""
        from transformerengine_tpu.ops.rope import (apply_rope,
                                                    apply_rope_thd,
                                                    rope_frequencies)
        key = jax.random.PRNGKey(0)
        lens = [5, 9, 2]
        T, H, D = sum(lens), 2, 8
        x = jax.random.normal(key, (T, H, D), jnp.float32)
        cu = jnp.asarray([0, 5, 14, 16], jnp.int32)
        freqs = rope_frequencies(D, 32)
        out = apply_rope_thd(x, cu, freqs)
        o = 0
        for n in lens:
            ref = apply_rope(x[o:o + n][None], freqs)[0]
            assert jnp.allclose(out[o:o + n], ref, atol=1e-6)
            o += n

    def test_thd_start_positions(self):
        from transformerengine_tpu.ops.rope import (apply_rope,
                                                    apply_rope_thd,
                                                    rope_frequencies)
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 1, 8), jnp.float32)
        cu = jnp.asarray([0, 3, 6], jnp.int32)
        freqs = rope_frequencies(8, 64)
        out = apply_rope_thd(x, cu, freqs,
                             start_positions=jnp.asarray([10, 20]))
        ref0 = apply_rope(x[:3][None], freqs,
                          positions=jnp.arange(10, 13)[None])[0]
        ref1 = apply_rope(x[3:][None], freqs,
                          positions=jnp.arange(20, 23)[None])[0]
        assert jnp.allclose(out[:3], ref0, atol=1e-6)
        assert jnp.allclose(out[3:], ref1, atol=1e-6)

    def test_fused_qkv_rope(self):
        """apply_rope_qkv == split + per-tensor apply_rope (reference:
        nvte_fused_qkv_rope)."""
        from transformerengine_tpu.ops.rope import (apply_rope,
                                                    apply_rope_qkv,
                                                    rope_frequencies)
        B, S, Hq, Hkv, D = 2, 7, 4, 2, 8
        qkv = jax.random.normal(jax.random.PRNGKey(2),
                                (B, S, (Hq + 2 * Hkv) * D), jnp.float32)
        freqs = rope_frequencies(D, 16)
        q, k, v = apply_rope_qkv(qkv, freqs, num_q_heads=Hq,
                                 num_kv_heads=Hkv, head_dim=D)
        qr = qkv[..., :Hq * D].reshape(B, S, Hq, D)
        kr = qkv[..., Hq * D:(Hq + Hkv) * D].reshape(B, S, Hkv, D)
        vr = qkv[..., (Hq + Hkv) * D:].reshape(B, S, Hkv, D)
        assert jnp.allclose(q, apply_rope(qr, freqs), atol=1e-6)
        assert jnp.allclose(k, apply_rope(kr, freqs), atol=1e-6)
        assert jnp.array_equal(v, vr)
