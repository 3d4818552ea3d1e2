"""Generation engine: jitted prefill + decode loop over the KV cache.

The TPU analog of the reference's generation path (reference:
docs/examples/te_gemma — KV cache + CUDA-graph decode; on TPU the whole
decode step is one jitted program, so "CUDA graph capture" is just
jit + lax.scan). Continuous batching hooks: per-sequence lengths live
in the cache, so finished sequences can be replaced by resetting their
length and writing a new prompt (slot reuse).

Sampling parameters (temperature / top_k / top_p) are traced values:
changing 0.7 -> 0.9 or top_k 40 -> 50 does NOT recompile. Only the
sampling *structure* (greedy vs sampled, top-k/top-p on vs off) is
static, so each mode compiles once and keeps its fast path (greedy
decode never pays for a vocab sort).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .kv_cache import InferenceParams


def _sample_mode(temperature, top_k, top_p) -> Tuple[bool, bool, bool]:
    """Static sampling structure from (possibly Python-number) params."""
    greedy = isinstance(temperature, (int, float)) and float(temperature) == 0.0
    use_top_k = not (isinstance(top_k, (int, float)) and int(top_k) <= 0)
    use_top_p = not (isinstance(top_p, (int, float)) and float(top_p) >= 1.0)
    return (greedy, use_top_k, use_top_p)


def _sample(logits, key, sampling, mode):
    """Greedy / temperature / top-k / nucleus sampling. ``sampling`` holds
    traced (temperature, top_k, top_p); ``mode`` is the static structure."""
    greedy, use_top_k, use_top_p = mode
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temperature, top_k, top_p = sampling
    x = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    if use_top_k or use_top_p:
        sorted_x = jnp.sort(x, axis=-1)[..., ::-1]
    if use_top_k:
        idx = jnp.clip(top_k - 1, 0, x.shape[-1] - 1)
        kth = jnp.take_along_axis(
            sorted_x, jnp.broadcast_to(idx, (*sorted_x.shape[:-1], 1)),
            axis=-1)
        x = jnp.where(x < kth, -jnp.inf, x)
        if use_top_p:
            sorted_x = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, sorted_x.shape,
                                         sorted_x.ndim - 1) < top_k,
                sorted_x, -jnp.inf)
    if use_top_p:
        probs = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest logit still inside the nucleus
        inside = cum - probs < top_p
        cutoff = jnp.min(jnp.where(inside, sorted_x, jnp.inf),
                         axis=-1, keepdims=True)
        x = jnp.where(x < cutoff, -jnp.inf, x)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnums=(0, 3, 7))
def _prefill_jit(model, variables, tokens, inference_params, prompt_lengths,
                 sampling, rng_seed, mode):
    from ..attention import SequenceDescriptor
    desc = SequenceDescriptor.from_seqlens(prompt_lengths)
    logits, mutated = model.apply(
        variables, tokens, desc, deterministic=True,
        inference_params=inference_params, mutable=["cache"])
    # Cache lengths advanced by the full (padded) prompt width; rewind the
    # padding so decode appends right after each prompt's last real token.
    pad = tokens.shape[1] - prompt_lengths
    cache = jax.tree.map(lambda x: x, mutated["cache"])
    cache = _adjust_lengths(cache, -pad)
    last = jnp.take_along_axis(
        logits, (prompt_lengths - 1)[:, None, None], axis=1)[:, 0]
    tok = _sample(last, jax.random.PRNGKey(rng_seed), sampling, mode)
    return tok, cache


def prefill(model, variables, tokens, inference_params: InferenceParams,
            prompt_lengths, temperature=0.0, rng_seed=0,
            top_k=0, top_p=1.0):
    """Run the prompt through the model, filling the cache.
    Returns (first sampled token (B,), cache collection)."""
    mode = _sample_mode(temperature, top_k, top_p)
    sampling = (jnp.asarray(temperature, jnp.float32),
                jnp.asarray(top_k, jnp.int32),
                jnp.asarray(top_p, jnp.float32))
    return _prefill_jit(model, variables, tokens, inference_params,
                        prompt_lengths, sampling,
                        jnp.asarray(rng_seed, jnp.uint32), mode)


def _adjust_lengths(cache, delta):
    def fix(path, leaf):
        if path[-1].key == "cache_length":
            return leaf + delta
        return leaf
    return jax.tree_util.tree_map_with_path(fix, cache)


@partial(jax.jit, static_argnums=(0, 4, 5, 8))
def _decode_steps_jit(model, variables, cache, first_token,
                      inference_params, num_steps, sampling, rng, mode):
    base = {k: v for k, v in variables.items() if k != "cache"}

    def step(carry, _):
        tok, cache, rng = carry
        rng, sub = jax.random.split(rng)
        logits, mutated = model.apply(
            {**base, "cache": cache}, tok[:, None], deterministic=True,
            inference_params=inference_params, mutable=["cache"])
        nxt = _sample(logits[:, -1], sub, sampling, mode)
        return (nxt, mutated["cache"], rng), nxt

    (_, cache, _), toks = jax.lax.scan(
        step, (first_token, cache, rng), None, length=num_steps)
    return toks.T, cache              # (B, num_steps)


def decode_steps(model, variables, cache, first_token,
                 inference_params: InferenceParams, num_steps: int,
                 temperature=0.0, rng=None, top_k=0, top_p=1.0):
    """Greedy/temperature decode of ``num_steps`` tokens as one jitted
    lax.scan (the reference needs CUDA graphs for this; jit suffices)."""
    mode = _sample_mode(temperature, top_k, top_p)
    sampling = (jnp.asarray(temperature, jnp.float32),
                jnp.asarray(top_k, jnp.int32),
                jnp.asarray(top_p, jnp.float32))
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    return _decode_steps_jit(model, variables, cache, first_token,
                             inference_params, num_steps, sampling, rng, mode)


def generate(
    model,
    variables,
    prompt_tokens: jax.Array,         # (B, S_prompt) int32, right-padded
    prompt_lengths: jax.Array,        # (B,)
    max_new_tokens: int,
    *,
    inference_params: Optional[InferenceParams] = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    kv_cache_dtype=jnp.bfloat16,
) -> jax.Array:
    """End-to-end generation. Returns (B, max_new_tokens)."""
    b, sp = prompt_tokens.shape
    if inference_params is None:
        inference_params = InferenceParams(
            max_batch_size=b,
            max_sequence_length=sp + max_new_tokens,
            kv_cache_dtype=jnp.dtype(kv_cache_dtype))
    first, cache = prefill(model, variables, prompt_tokens, inference_params,
                           prompt_lengths, temperature, 0, top_k, top_p)
    toks, _ = decode_steps(model, variables, cache, first, inference_params,
                           max_new_tokens - 1, temperature, None, top_k,
                           top_p)
    return jnp.concatenate([first[:, None], toks], axis=1)
