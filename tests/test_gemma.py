"""Gemma model family (reference analog: docs/examples/te_gemma —
TransformerLayer-built Gemma with FP8 KV-cache generation)."""
import dataclasses

import jax
import jax.numpy as jnp

import transformerengine_tpu as te
from transformerengine_tpu.models.gemma import (
    GEMMA_TINY, GemmaModel, gemma_loss)


def _tokens(b=2, s=32, vocab=256):
    return jax.random.randint(jax.random.PRNGKey(0), (b, s), 1, vocab)


class TestGemma:
    def test_forward_shapes_and_softcap(self):
        cfg = dataclasses.replace(GEMMA_TINY, final_logit_softcap=30.0)
        model = GemmaModel(config=cfg)
        tokens = _tokens()
        variables = model.init(jax.random.PRNGKey(1), tokens)
        logits = model.apply(variables, tokens)
        assert logits.shape == (2, 32, cfg.vocab_size)
        assert float(jnp.abs(logits).max()) <= 30.0

    def test_grads_finite(self):
        cfg = dataclasses.replace(GEMMA_TINY, dtype=jnp.float32)
        model = GemmaModel(config=cfg)
        tokens = _tokens()
        variables = model.init(jax.random.PRNGKey(1), tokens)

        @jax.jit
        def grad_fn(p):
            def loss(p):
                logits = model.apply({"params": p}, tokens[:, :-1])
                return gemma_loss(logits, tokens[:, 1:])
            return jax.value_and_grad(loss)(p)

        loss, grads = grad_fn(variables["params"])
        assert jnp.isfinite(loss)
        assert all(bool(jnp.isfinite(l).all())
                   for l in jax.tree.leaves(grads))

    def test_fp8_generation(self):
        """Prefill + decode through the engine with an FP8 KV cache —
        the te_gemma tutorial's headline flow."""
        from transformerengine_tpu.inference import (
            InferenceParams, decode_steps, prefill)
        from transformerengine_tpu.quantize.dtypes import float8_e4m3
        model = GemmaModel(config=GEMMA_TINY)
        b, prompt = 2, 16
        tokens = _tokens(b=b, s=prompt)
        variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)
        ip = InferenceParams(max_batch_size=b, max_sequence_length=64,
                             kv_cache_dtype=jnp.dtype(float8_e4m3))
        lengths = jnp.full((b,), prompt, jnp.int32)
        first, cache = prefill(model, variables, tokens, ip, lengths, 0.0)
        toks, _ = decode_steps(model, variables, cache, first, ip, 4, 0.0)
        assert toks.shape == (b, 4)
        assert bool((toks >= 0).all())

    def test_scan_matches_loop_param_count(self):
        cfg = dataclasses.replace(GEMMA_TINY, dtype=jnp.float32)
        tokens = _tokens()
        n = lambda v: sum(x.size for x in jax.tree.leaves(v["params"]))
        vloop = GemmaModel(config=cfg).init(jax.random.PRNGKey(1), tokens)
        vscan = GemmaModel(config=dataclasses.replace(
            cfg, scan_layers=True)).init(jax.random.PRNGKey(1), tokens)
        assert n(vloop) == n(vscan)
