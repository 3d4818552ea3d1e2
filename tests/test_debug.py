"""Numerics-debug toolkit (reference analog: tests/pytorch/debug/ with
YAML configs selecting per-layer features)."""
import jax
import jax.numpy as jnp
import pytest

import transformerengine_tpu as te
from transformerengine_tpu.debug import (
    compute_blockwise_dynamic_range, compute_tensor_stats, get_state,
    initialize, step, wrap_quantizer_set)
from transformerengine_tpu.quantize.helper import QuantizerFactory


@pytest.fixture(autouse=True)
def _reset_debug():
    yield
    get_state().reset()


class TestStats:
    def test_tensor_stats(self):
        x = jnp.array([0.0, 1.0, -4.0, 2.0 ** -10])
        s = compute_tensor_stats(x)
        assert float(s["amax"]) == 4.0
        assert float(s["zero_pct"]) == 25.0
        assert float(s["underflow_pct"]) == 25.0  # 2^-10 < e4m3 tiny 2^-6

    def test_blockwise_dynamic_range(self):
        x = jnp.concatenate([jnp.full((32,), 2.0), jnp.full((32,), 8.0)])
        dr = compute_blockwise_dynamic_range(x, block=32)
        assert float(dr) == 0.0  # uniform within blocks
        x2 = jnp.concatenate([jnp.full((16,), 1.0), jnp.full((16,), 4.0)])
        assert float(compute_blockwise_dynamic_range(x2, block=32)) == 2.0


class TestFeatures:
    def _config(self, feature, **kw):
        return {"sec": {
            "enabled": True,
            "layers": {"layer_name_regex_pattern": ".*mlp.*"},
            "transformer_engine": {feature: {"enabled": True, **kw}},
        }}

    def test_disable_quantization_layer(self):
        initialize(self._config("DisableFP8Layer"))
        qset = QuantizerFactory.create_set(te.Float8CurrentScaling())
        wrapped = wrap_quantizer_set(qset, "model/mlp1")
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 32))
        out = wrapped.x.quantize(x)
        assert isinstance(out, jax.Array)       # passthrough, not quantized
        # unmatched layer still quantizes
        other = wrap_quantizer_set(qset, "model/attn")
        assert not isinstance(other.x.quantize(x), jax.Array)

    def test_disable_gemm_role_mapping(self):
        initialize(self._config("DisableFP8GEMM", gemms=["dgrad"]))
        qset = QuantizerFactory.create_set(te.Float8CurrentScaling())
        w = wrap_quantizer_set(qset, "mlp_block")
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 16))
        assert isinstance(w.dgrad.quantize(x), jax.Array)
        assert not isinstance(w.x.quantize(x), jax.Array)

    def test_fake_quant(self):
        initialize(self._config("FakeQuant", tensors=["x"]))
        qset = QuantizerFactory.create_set(te.Float8CurrentScaling())
        w = wrap_quantizer_set(qset, "the_mlp")
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 32))
        out = w.x.quantize(x)
        assert isinstance(out, jax.Array)
        assert out.shape == x.shape
        # quantize->dequantize introduces fp8 error but stays close
        assert 0 < float(jnp.max(jnp.abs(out - x))) < 0.1 * float(
            jnp.max(jnp.abs(x)))

    def test_log_tensor_stats_records(self):
        initialize(self._config("LogTensorStats", tensors=["x"], freq=1))
        qset = QuantizerFactory.create_set(te.Float8CurrentScaling())
        w = wrap_quantizer_set(qset, "stats_mlp")
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 32))
        w.x.quantize(x)
        entries = get_state().stats.entries("stats_mlp")
        assert len(entries) == 1
        assert "amax" in entries[0][2]

    def test_log_nvfp4_tensor_stats_records(self):
        """(reference: debug/features/log_nvfp4_tensor_stats.py —
        underflows% and mse of the NVFP4 round-trip)"""
        initialize(self._config("LogNVFP4TensorStats", tensors=["x"],
                                freq=1))
        qset = QuantizerFactory.create_set(te.Float8CurrentScaling())
        w = wrap_quantizer_set(qset, "nvfp4_mlp")
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 32))
        w.x.quantize(x)
        entries = get_state().stats.entries("nvfp4_mlp")
        assert len(entries) == 1
        stats = entries[0][2]
        assert "mse" in stats and "underflows_pct" in stats
        assert stats["mse"] > 0.0          # fp4 is lossy on gaussians
        assert 0.0 <= stats["underflows_pct"] < 50.0

    def test_unknown_feature_raises(self):
        with pytest.raises(ValueError, match="unknown debug feature"):
            initialize(self._config("NotAFeature"))

    def test_module_integration(self):
        """Flax module wraps quantizers when debug is on."""
        from transformerengine_tpu.flax import LayerNormMLP
        initialize({"s": {"enabled": True,
                          "layers": {"layer_name_regex_pattern": ".*"},
                          "transformer_engine": {
                              "LogTensorStats": {"enabled": True,
                                                 "tensors": ["x"]}}}})
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32), jnp.float32)
        with te.autocast(enabled=True, recipe=te.Float8CurrentScaling()):
            mlp = LayerNormMLP(intermediate_dim=64, activations="swiglu",
                               use_bias=False, norm_type="rmsnorm")
            variables = mlp.init(jax.random.PRNGKey(1), x)
            mlp.apply(variables, x)
        assert len(get_state().stats.entries()) > 0


class TestDistributedStats:
    """Stats under a device mesh must equal the single-device values:
    the quantizers see the GLOBAL logical tensor inside pjit, so XLA
    inserts the cross-device reductions for amax/underflow%/dynamic
    range (reference: debug/features/utils/stats_computation.py +
    docs/debug/4_distributed.rst — stats reduced over the TP/DP
    groups)."""

    def _config(self, feature, **kw):
        return {"stats_test": {
            "enabled": True,
            "layers": {"layer_name_regex_pattern": ".*"},
            "transformer_engine": {
                feature: {"enabled": True, **kw}}}}

    def test_log_tensor_stats_match_single_device(self):
        from jax.experimental import mesh_utils
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from transformerengine_tpu.debug import initialize, get_state, \
            wrap_quantizer_set
        from transformerengine_tpu.quantize.helper import QuantizerFactory

        x = jax.random.normal(jax.random.PRNGKey(0), (64, 64)) * 0.3
        # make underflow% non-trivial
        x = x.at[:8].multiply(1e-6)

        def run(tag, xin):
            initialize(self._config("LogTensorStats", tensors=["x"],
                                    freq=1))
            qset = QuantizerFactory.create_set(te.Float8CurrentScaling())
            w = wrap_quantizer_set(qset, tag)

            from transformerengine_tpu.quantize.tensor import \
                get_rowwise

            @jax.jit
            def f(x):
                return get_rowwise(w.x.quantize(x)).data

            f(xin).block_until_ready()
            jax.effects_barrier()
            entries = get_state().stats.entries(tag)
            get_state().reset()
            assert len(entries) == 1, entries
            return entries[0][2]

        ref = run("single", x)

        mesh = Mesh(mesh_utils.create_device_mesh(
            (2, 4), jax.devices()[:8]), ("dp", "tp"))
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", "tp")))
        dist = run("dist", xs)
        for key in ("amax", "underflow_pct", "dynamic_range", "l2norm",
                    "zero_pct"):
            assert abs(float(ref[key]) - float(dist[key])) <= 1e-4 * (
                1 + abs(float(ref[key]))), (key, ref[key], dist[key])
