"""Flax modules: TransformerLayer / MHA / LayerNormMLP smoke + numerics,
and the overwrite-with-gradient quantizer-state flow
(reference analog: tests/jax/test_layer.py, test_praxis_layers.py)."""
import jax
import jax.numpy as jnp
import pytest

import transformerengine_tpu as te
from transformerengine_tpu.flax import (
    QUANTIZE_META, LayerNormMLP, MultiHeadAttention, TransformerLayer,
    update_quantize_meta)


def _layer(**kw):
    args = dict(hidden_size=64, mlp_hidden_size=128, num_attention_heads=4,
                num_gqa_groups=2, norm_type="rmsnorm",
                mlp_activations="swiglu", use_bias=False,
                enable_rotary_pos_emb=True, max_seq_len=128)
    args.update(kw)
    return TransformerLayer(**args)


class TestTransformerLayer:
    def test_fwd_bwd_bf16(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64), jnp.float32)
        layer = _layer()
        variables = layer.init(jax.random.PRNGKey(1), x)
        out = layer.apply(variables, x)
        assert out.shape == x.shape
        g = jax.grad(lambda v: jnp.sum(layer.apply(v, x).astype(jnp.float32)**2))(
            variables)
        leaves = jax.tree.leaves(g)
        assert all(jnp.all(jnp.isfinite(l.astype(jnp.float32))) for l in leaves)

    def test_fp8_close_to_bf16(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64), jnp.float32)
        layer = _layer()
        variables = layer.init(jax.random.PRNGKey(1), x)
        out_bf16 = layer.apply(variables, x)
        with te.autocast(enabled=True, recipe=te.Float8CurrentScaling()):
            layer8 = _layer()
            vars8 = layer8.init(jax.random.PRNGKey(1), x)
            # params are identical; quantize_meta may add state
            out_fp8 = layer8.apply(
                {"params": vars8["params"], **{k: v for k, v in vars8.items()
                                               if k != "params"}}, x)
        scale = jnp.maximum(jnp.max(jnp.abs(out_bf16)), 1e-3)
        assert jnp.max(jnp.abs(out_fp8 - out_bf16)) / scale < 0.15

    def test_delayed_scaling_owg_state_update(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64), jnp.float32)
        with te.autocast(enabled=True,
                         recipe=te.DelayedScaling(amax_history_len=8)):
            layer = _layer()
            variables = layer.init(jax.random.PRNGKey(1), x)
            assert QUANTIZE_META in variables
            meta0 = variables[QUANTIZE_META]

            def loss_fn(params, qmeta):
                out = layer.apply(
                    {"params": params, QUANTIZE_META: qmeta}, x)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            _, (gp, gq) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                variables["params"], meta0)
        # OWG: the "gradient" of quantize_meta is the updated state.
        flat0 = jax.tree_util.tree_leaves_with_path(meta0)
        flat1 = dict(jax.tree_util.tree_leaves_with_path(gq))
        changed = 0
        for path, v0 in flat0:
            v1 = flat1[path]
            assert v1.shape == v0.shape
            if not jnp.allclose(v0, v1):
                changed += 1
        assert changed > 0, "delayed-scaling state did not update"
        new_vars = update_quantize_meta(
            {"params": variables["params"], QUANTIZE_META: meta0},
            {QUANTIZE_META: gq})
        assert QUANTIZE_META in new_vars

    def test_decoder_layer_cross_attention(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64), jnp.float32)
        enc = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 64), jnp.float32)
        layer = _layer(layer_type="decoder")
        variables = layer.init(jax.random.PRNGKey(2), x, enc)
        out = layer.apply(variables, x, enc)
        assert out.shape == x.shape
        assert "inter_attention" in variables["params"]


class TestRegularizers:
    """drop_path and intermediate dropout must actually apply (VERDICT r1:
    both were accepted and silently ignored)."""

    def test_drop_path_applies(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 64), jnp.float32)
        layer = _layer(drop_path=0.99)
        variables = layer.init(jax.random.PRNGKey(1), x)
        det = layer.apply(variables, x, deterministic=True)
        stoch = layer.apply(variables, x, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(2)})
        assert not jnp.allclose(det, stoch)
        # with p≈1 nearly every branch is dropped -> output ≈ input
        assert float(jnp.mean(jnp.abs(stoch - x.astype(stoch.dtype)))) < \
            float(jnp.mean(jnp.abs(det - x.astype(det.dtype))))

    def test_drop_path_deterministic_noop(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64), jnp.float32)
        base = _layer()
        withdp = _layer(drop_path=0.5)
        v = base.init(jax.random.PRNGKey(1), x)
        assert jnp.array_equal(base.apply(v, x), withdp.apply(v, x))

    def test_intermediate_dropout_applies(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64), jnp.float32)
        mlp = LayerNormMLP(intermediate_dim=128, activations="swiglu",
                           use_bias=False, intermediate_dropout_rate=0.5)
        variables = mlp.init(jax.random.PRNGKey(1), x)
        det = mlp.apply(variables, x, deterministic=True)
        s1 = mlp.apply(variables, x, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
        s2 = mlp.apply(variables, x, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(3)})
        assert not jnp.allclose(det, s1)
        assert not jnp.allclose(s1, s2)
        # deterministic path must equal the fused block (rate ignored)
        assert jnp.allclose(
            det, LayerNormMLP(intermediate_dim=128, activations="swiglu",
                              use_bias=False).apply(variables, x))


class TestMultiHeadAttention:
    def test_gqa_shapes(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64), jnp.float32)
        mha = MultiHeadAttention(hidden_size=64, num_attention_heads=4,
                                 num_gqa_groups=2, use_bias=False)
        variables = mha.init(jax.random.PRNGKey(1), x)
        out = mha.apply(variables, x)
        assert out.shape == x.shape
        import flax.linen as fnn
        qkv_kernel = fnn.meta.unbox(variables)["params"]["qkv"]["kernel"]
        # hq*d + 2*hkv*d = 4*16 + 2*2*16 = 128
        assert qkv_kernel.shape == (64, 128)


class TestModel:
    def test_llama_tiny_fwd_loss(self):
        from transformerengine_tpu.models.llama import (
            LLAMA_TINY, LlamaModel, cross_entropy_loss)
        model = LlamaModel(config=LLAMA_TINY)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 64), 0, 256)
        variables = model.init(jax.random.PRNGKey(1), tokens)
        logits = model.apply(variables, tokens)
        assert logits.shape == (2, 64, 256)
        loss = cross_entropy_loss(logits[:, :-1], tokens[:, 1:])
        assert jnp.isfinite(loss)


class TestScanLayers:
    def test_scan_matches_loop(self):
        """scan_layers=True must match the unrolled loop numerically when
        given the same per-layer params."""
        import dataclasses
        from transformerengine_tpu.models.llama import LLAMA_TINY, LlamaModel
        tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 16), 1, 256)
        cfg = dataclasses.replace(LLAMA_TINY, num_layers=2)
        m_loop = LlamaModel(config=cfg)
        m_scan = LlamaModel(config=dataclasses.replace(cfg, scan_layers=True))
        v_loop = m_loop.init(jax.random.PRNGKey(1), tokens)
        # stack loop params into the scanned layout
        import flax.linen as fnn
        p = fnn.meta.unbox(v_loop["params"])
        stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                               p["layer_0"], p["layer_1"])
        v_scan = {"params": {"embedding": p["embedding"],
                             "final_norm": p["final_norm"],
                             "layers": stacked}}
        out_loop = m_loop.apply(v_loop, tokens)
        out_scan = m_scan.apply(v_scan, tokens)
        # scan vs unrolled change XLA fusion/accumulation order -> bf16
        # rounding differs; require close logits and identical argmax
        denom = jnp.maximum(jnp.max(jnp.abs(out_loop)), 1.0)
        assert float(jnp.max(jnp.abs(out_loop - out_scan)) / denom) < 0.02
        assert jnp.array_equal(out_loop.argmax(-1), out_scan.argmax(-1))

    def test_scan_generate(self):
        import dataclasses
        from transformerengine_tpu.inference import generate
        from transformerengine_tpu.models.llama import LLAMA_TINY, LlamaModel
        cfg = dataclasses.replace(LLAMA_TINY, scan_layers=True)
        m = LlamaModel(config=cfg)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 1, 256)
        v = m.init(jax.random.PRNGKey(1), tokens)
        out = generate(m, v, tokens, jnp.full((1,), 8, jnp.int32), 3)
        assert out.shape == (1, 3)


class TestLoRA:
    """Low-rank adaptation on the projection modules (reference:
    jax/flax/module.py:137 _apply_low_rank_adaptation, :555-579)."""

    def test_zero_init_matches_base(self):
        """lora_b is zero-initialized: the adapted module must produce
        exactly the base output at init."""
        from transformerengine_tpu.flax.module import DenseGeneral
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32), jnp.float32)
        base = DenseGeneral(features=64, use_bias=False)
        lora = DenseGeneral(features=64, use_bias=False,
                            enable_low_rank_adaptation=True,
                            low_rank_adaptation_dim=8)
        vb = base.init(jax.random.PRNGKey(1), x)
        vl = lora.init(jax.random.PRNGKey(1), x)
        assert "lora_a_kernel" in vl["params"]
        assert jnp.all(vl["params"]["lora_b_kernel"] == 0)
        assert jnp.array_equal(base.apply(vb, x), lora.apply(vl, x))

    def test_adapter_gradients_flow(self):
        from transformerengine_tpu.flax.module import DenseGeneral
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32), jnp.float32)
        m = DenseGeneral(features=64, use_bias=False,
                         enable_low_rank_adaptation=True,
                         low_rank_adaptation_dim=8,
                         low_rank_adaptation_alpha=16.0)
        v = m.init(jax.random.PRNGKey(1), x)
        g = jax.grad(lambda p: jnp.sum(
            m.apply({"params": p}, x).astype(jnp.float32) ** 2))(v["params"])
        assert jnp.any(g["lora_b_kernel"] != 0)
        # alpha/rank scaling: nonzero B must change the output
        p2 = dict(v["params"], lora_b_kernel=jnp.ones_like(
            v["params"]["lora_b_kernel"]))
        assert not jnp.array_equal(m.apply({"params": p2}, x),
                                   m.apply(v, x))

    def test_transformer_layer_lora(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64),
                              jnp.float32)
        layer = _layer(enable_low_rank_adaptation=True,
                       low_rank_adaptation_dim=4)
        v = layer.init(jax.random.PRNGKey(1), x)
        flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
        lora_names = [jax.tree_util.keystr(k) for k, _ in flat
                      if "lora" in jax.tree_util.keystr(k)]
        # qkv + out in MHA, wi + wo in MLP, A and B each -> 8 params
        assert len(lora_names) == 8, lora_names
        out = layer.apply(v, x)
        assert out.shape == x.shape
        # fp8 path composes with LoRA
        with te.autocast(enabled=True, recipe=te.Float8CurrentScaling()):
            v8 = layer.init(jax.random.PRNGKey(1), x)
            out8 = layer.apply(v8, x)
        assert jnp.all(jnp.isfinite(out8.astype(jnp.float32)))


class TestRelativePositionBiases:
    """T5-style trained relative position bias (reference:
    jax/flax/transformer.py:1735)."""

    def test_shape_and_buckets(self):
        from transformerengine_tpu.flax.transformer import (
            RelativePositionBiases)
        m = RelativePositionBiases(num_buckets=32, max_distance=64,
                                   num_attention_heads=4)
        v = m.init(jax.random.PRNGKey(0), 8, 8)
        assert v["params"]["rel_embedding"].shape == (32, 4)
        b = m.apply(v, 8, 8)
        assert b.shape == (1, 4, 8, 8)
        # same distance -> same bias (bucketing is a function of offset)
        assert jnp.allclose(b[0, :, 0, 3], b[0, :, 2, 5])
        # unidirectional: future positions all share the zero bucket
        bu = m.apply(v, 8, 8, False)
        assert jnp.allclose(bu[0, :, 0, 5], bu[0, :, 0, 1])

    def test_transformer_layer_trains_bias(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64),
                              jnp.float32)
        layer = _layer(enable_relative_embedding=True)
        v = layer.init(jax.random.PRNGKey(1), x)
        assert "relpos_bias" in v["params"]
        g = jax.grad(lambda p: jnp.sum(layer.apply(
            {"params": p}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)}).astype(jnp.float32)
            ** 2))(v["params"])
        emb_g = g["relpos_bias"]["rel_embedding"]
        assert jnp.any(emb_g != 0) and jnp.all(jnp.isfinite(emb_g))


class TestSoftmaxModule:
    """Flax Softmax module (reference: jax/flax/module.py:164)."""

    def _logits(self):
        return jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))

    def test_vanilla_matches_jax(self):
        from transformerengine_tpu.flax import Softmax
        x = self._logits()
        m = Softmax(scale_factor=0.5)
        out = m.apply({}, x)
        ref = jax.nn.softmax(x * 0.5, axis=-1)
        assert jnp.allclose(out, ref, atol=1e-6)

    def test_masked(self):
        from transformerengine_tpu.flax import Softmax
        from transformerengine_tpu.softmax import SoftmaxType as F
        x = self._logits()
        mask = jnp.zeros((2, 1, 8, 8), jnp.int32).at[..., -2:].set(1)
        out = Softmax(softmax_fusion_type=F.SCALED_MASKED).apply(
            {}, x, mask=mask)
        assert jnp.allclose(out[..., -2:], 0.0, atol=1e-6)
        assert jnp.allclose(out.sum(-1), 1.0, atol=1e-5)

    def test_off_by_one_sink(self):
        from transformerengine_tpu.attention import SoftmaxType as S
        from transformerengine_tpu.flax import Softmax
        x = self._logits()
        out = Softmax(softmax_type=S.OFF_BY_ONE).apply({}, x)
        s = out.sum(-1)
        assert bool(jnp.all(s < 1.0))  # sink absorbed some mass
        ref = jnp.exp(x) / (1.0 + jnp.exp(x).sum(-1, keepdims=True))
        assert jnp.allclose(out, ref, atol=1e-5)

    def test_learnable_sink_param(self):
        from transformerengine_tpu.attention import SoftmaxType as S
        from transformerengine_tpu.flax import Softmax
        x = self._logits()
        m = Softmax(softmax_type=S.LEARNABLE)
        variables = m.init(jax.random.PRNGKey(1), x)
        assert variables["params"]["softmax_offset"].shape == (4,)
        out = m.apply(variables, x)
        assert bool(jnp.all(out.sum(-1) < 1.0))


def test_extend_logical_axis_rules():
    """(reference: jax/flax/transformer.py:63)"""
    import transformerengine_tpu as te
    from transformerengine_tpu.flax import extend_logical_axis_rules
    from transformerengine_tpu.parallel import sharding as sh
    res = te.MeshResource(dp_resource="data", tp_resource="model")
    with te.global_shard_guard(res):
        rules = extend_logical_axis_rules((("embed", "model"),))
    d = dict(rules)
    assert d["embed"] == "model"            # user rule kept
    assert d[sh.W_TP_AXES] == "model"
    assert d[sh.BATCH_AXES] == ("data",)
    # user override wins over the package rule
    with te.global_shard_guard(res):
        rules2 = extend_logical_axis_rules(((sh.W_TP_AXES, None),))
    assert dict(rules2)[sh.W_TP_AXES] is None


def test_mha_learnable_sink_cached_prefill_matches_train_path():
    """The learnable sink lives in MHA scope so the training (DPA) path
    and the cached-inference path share one parameter; prefill through
    the KV cache must reproduce the train-path forward."""
    from transformerengine_tpu.attention import SoftmaxType
    from transformerengine_tpu.flax import MultiHeadAttention
    from transformerengine_tpu.inference import InferenceParams

    mha = MultiHeadAttention(
        hidden_size=64, num_attention_heads=4, num_gqa_groups=2,
        softmax_type=SoftmaxType.LEARNABLE, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64), jnp.float32)
    variables = mha.init(jax.random.PRNGKey(1), x)
    params = variables["params"]
    assert params["softmax_offset"].shape == (4,)
    params = dict(params, softmax_offset=jnp.linspace(-1.0, 1.0, 4))
    variables = dict(variables, params=params)

    ref = mha.apply(variables, x)
    ip = InferenceParams(max_batch_size=2, max_sequence_length=64)
    out, _ = mha.apply(variables, x, inference_params=ip,
                       mutable=["cache"])
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


class TestIntegrationShims:
    """Explicit-recipe integration helpers (reference:
    jax/flax/module.py wrap_function_in_te_state_module :1364,
    make_dot_general_cls :1411, make_grouped_dense_cls :1455)."""

    def test_make_dot_general_cls_in_nn_dense(self):
        from flax import linen as nn
        from transformerengine_tpu.flax import make_dot_general_cls
        dg = make_dot_general_cls(te.Float8CurrentScaling())
        dense = nn.Dense(16, use_bias=False, dot_general=dg())
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 32))
        variables = dense.init(jax.random.PRNGKey(1), x)
        out = dense.apply(variables, x)
        ref = x @ variables["params"]["kernel"]
        # fp8 quantization error, not exact
        assert out.shape == (8, 16)
        assert float(jnp.abs(out - ref).max()) < 0.35
        assert float(jnp.abs(out - ref).max()) > 0.0   # actually quantized

    def test_make_dot_general_cls_rejects_delayed(self):
        from transformerengine_tpu.flax import make_dot_general_cls
        with pytest.raises(NotImplementedError, match="DelayedScaling"):
            make_dot_general_cls(te.DelayedScaling())

    def test_wrap_function_in_te_state_module_delayed_state(self):
        """The wrapper carries DelayedScaling state in quantize_meta and
        updates it by overwrite-with-gradient."""
        from transformerengine_tpu.flax import (
            update_quantize_meta, wrap_function_in_te_state_module)

        def my_gemm(generate_quantizer_set, x, w):
            return te.dense(x, w, quantizer_set=generate_quantizer_set())

        mod = wrap_function_in_te_state_module(
            my_gemm, te.DelayedScaling(amax_history_len=4))()
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 32))
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16)) * 0.1
        variables = mod.init(jax.random.PRNGKey(2), x, w)
        assert "quantize_meta" in variables
        hist = variables["quantize_meta"]["my_gemm_q0_x_amax_history"]
        assert hist.shape == (4,)

        def loss(qmeta, x, w):
            out = mod.apply(
                {"quantize_meta": qmeta}, x, w)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(variables["quantize_meta"], x, w)
        # overwrite-with-gradient: the "grad" holds the rolled history
        assert float(jnp.max(g["my_gemm_q0_x_amax_history"])) > 0.0
        merged = update_quantize_meta(variables, {"quantize_meta": g})
        assert (merged["quantize_meta"] is g)

    def test_make_grouped_dense_cls(self):
        from transformerengine_tpu.flax import make_grouped_dense_cls
        mod = make_grouped_dense_cls(te.MXFP8BlockScaling())()
        e, h, f = 2, 32, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (8, h))
        w = jax.random.normal(jax.random.PRNGKey(1), (e, h, f)) * 0.1
        gs = jnp.array([5, 3], jnp.int32)
        variables = mod.init(jax.random.PRNGKey(2), x, w, gs)
        out = mod.apply(variables, x, w, gs)
        ref = jnp.concatenate([x[:5] @ w[0], x[5:] @ w[1]])
        assert float(jnp.abs(out - ref).max()) < 0.35

    def test_transformer_layer_type_enum(self):
        from transformerengine_tpu.flax import (
            TransformerLayer, TransformerLayerType)
        layer = TransformerLayer(
            hidden_size=32, mlp_hidden_size=64, num_attention_heads=2,
            layer_type=TransformerLayerType.DECODER, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
        enc = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
        variables = layer.init(jax.random.PRNGKey(2), x, enc)
        assert "inter_attention" in variables["params"]
        out = layer.apply(variables, x, enc)
        assert out.shape == x.shape
