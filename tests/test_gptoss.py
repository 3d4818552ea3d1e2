"""GPT-OSS-class model: sinks + alternating banded attention + clamped
SwiGLU MoE (reference features: nvte_clamped_swiglu, NVTE_Softmax_Type
sink types, MoE glue)."""
import jax
import jax.numpy as jnp
import pytest

import transformerengine_tpu as te
from transformerengine_tpu.models.gptoss import (
    GPTOSS_TINY, GptOssModel, gptoss_loss)


@pytest.fixture(scope="module")
def model_and_vars():
    model = GptOssModel(config=GPTOSS_TINY)
    tokens = jnp.zeros((2, 64), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    return model, variables


class TestGptOss:
    def test_forward_shapes_and_params(self, model_and_vars):
        model, variables = model_and_vars
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 1, 256)
        logits = model.apply(variables, tokens,
                             mutable=["intermediates"])[0]
        assert logits.shape == (2, 64, GPTOSS_TINY.vocab_size)
        # learnable sink per layer, clamped-swiglu expert stacks
        p = variables["params"]
        assert p["layer_0"]["self_attention"]["softmax_offset"].shape == (4,)
        assert "wi_kernel" in p["layer_0"]["mlp"]

    def test_loss_and_grads_finite(self, model_and_vars):
        model, variables = model_and_vars
        tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 64), 1, 256)

        def loss(params):
            return gptoss_loss(model, {**variables, "params": params},
                               tokens[:, :-1], tokens[:, 1:])

        lv, g = jax.value_and_grad(loss)(variables["params"])
        assert jnp.isfinite(lv)
        assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g))
        # the sink participates: its grad is nonzero
        gs = g["layer_0"]["self_attention"]["softmax_offset"]
        assert jnp.any(gs != 0)

    def test_banded_layers_ignore_distant_context(self, model_and_vars):
        """Perturbing a token beyond every window + attention path should
        change nearby logits but a 1-layer banded-only stack must not see
        past its window."""
        import dataclasses
        cfg = dataclasses.replace(GPTOSS_TINY, num_layers=1)
        model = GptOssModel(config=cfg)
        tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 64), 1, 256)
        variables = model.init(jax.random.PRNGKey(4), tokens)
        base = model.apply(variables, tokens, mutable=["intermediates"])[0]
        # layer 0 is banded with window 32: logit at position 63 cannot
        # depend on token 0 (63 - 0 > 32)
        perturbed = tokens.at[0, 0].set((tokens[0, 0] + 7) % 255 + 1)
        out = model.apply(variables, perturbed,
                          mutable=["intermediates"])[0]
        assert float(jnp.abs(out[0, 63] - base[0, 63]).max()) < 1e-5
        # ...but position 16 (within the window of token 0) does change
        assert float(jnp.abs(out[0, 16] - base[0, 16]).max()) > 1e-6

    def test_generation_with_cache(self, model_and_vars):
        from transformerengine_tpu.inference import generate
        model, variables = model_and_vars
        tokens = jax.random.randint(jax.random.PRNGKey(5), (2, 16), 1, 256)
        lens = jnp.full((2,), 16, jnp.int32)
        out = generate(model, variables, tokens, lens, 4,
                       kv_cache_dtype=jnp.float32)
        assert out.shape == (2, 4)
        # cached greedy decode must equal the uncached argmax rollout
        full = jnp.concatenate(
            [tokens, jnp.zeros((2, 4), jnp.int32)], axis=1)
        for t in range(4):
            logits = model.apply(variables, full[:, :16 + t],
                                 mutable=["intermediates"])[0]
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            full = full.at[:, 16 + t].set(nxt)
        assert jnp.array_equal(out, full[:, 16:])
