"""The BASELINE.md measurement ladder, one function per rung.

Ladder (BASELINE.md "Measurement ladder"):
  1. single Linear 768->3072, FP8 delayed-scaling fwd
  2. LayerNormMLP FP8 HYBRID block, fwd+bwd
  3. full-stack FP8 decode tokens/s (north star; lives in bench.py)
  4. MXFP8 block-scaled TransformerLayer prefill step
  5. NVFP4 sharded decode (multi-host; not measurable on one chip —
     the NVFP4 numerics run in the same harness via --recipe nvfp4)
plus the north-star p50 TTFT and a flash-attention prefill microbench
(the reference's benchmarks/attention/benchmark_attention.py analog).

All timing uses benchmarks.timing (chained-scan marginal pattern);
fp8-vs-bf16 pairs are measured back-to-back in one window because the
tunnel's absolute throughput drifts ~2.5x over tens of minutes (memory
note axon-tunnel-throughput-drift) — ratios survive, absolutes may not.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import transformerengine_tpu as te
from .timing import (chain_carry, marginal_seconds_interleaved,
                     marginal_seconds_per_step)

__all__ = ["bench_linear", "bench_ln_mlp", "bench_flash_prefill",
           "bench_mxfp8_layer", "bench_moe_mlp"]


def _normal(seed, shape, dtype=jnp.bfloat16, scale=1.0):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape) * scale
            ).astype(dtype)


def _timed(variants, make_carry, **kw):
    """marginal_seconds_interleaved + the drift-guard flags: returns
    (name -> seconds, [names whose marginal was replaced by the
    dispatch-inclusive upper bound]). Rungs emit the guarded list so a
    BENCH json consumer can tell a real marginal from a guarded one."""
    res = marginal_seconds_interleaved(variants, make_carry,
                                       with_flags=True, **kw)
    return ({k: v[0] for k, v in res.items()},
            sorted(k for k, v in res.items() if v[1]))


def sanity_check_ratio(out: dict, key: str, bound: float, why: str) -> dict:
    """Physical-bound guard for cross-variant speedup ratios (VERDICT r3
    weak #7: r2 published a 6.7x fp8-vs-bf16 linear ratio that no byte
    or FLOP accounting allows). A ratio above ``bound`` marks the rung's
    json LOUDLY rather than shipping a nonsense number silently."""
    import sys
    r = out.get(key)
    if r is not None and r > bound:
        msg = (f"SANITY VIOLATION {key}={r} exceeds the physical bound "
               f"{bound} ({why}) — measurement artifact, do not trust")
        print(msg, file=sys.stderr)
        out.setdefault("sanity_violations", []).append(msg)
    return out


def bench_linear(M=16384, K=768, N=3072):
    """Ladder #1: Linear K->N forward, FP8 delayed scaling vs BF16.
    Returns TFLOP/s for each and the ratio."""
    w = _normal(7, (K, N), scale=0.02)
    flops = 2.0 * M * K * N

    def step(c, params):
        w, qset = params
        y = te.dense(c, w, quantizer_set=qset)
        return chain_carry(c, y)

    t, guarded = _timed(
        {"fp8": (step, (w, te.QuantizerFactory.create_set(
            te.DelayedScaling(amax_history_len=16)))),
         "bf16": (step, (w, te.QuantizerFactory.create_set(None)))},
        lambda s: _normal(s, (M, K)), n_short=2, n_long=12)
    out = {"fp8_tflops": round(flops / t["fp8"] / 1e12, 1),
           "bf16_tflops": round(flops / t["bf16"] / 1e12, 1),
           "fp8_vs_bf16": round(t["bf16"] / t["fp8"], 3)}
    sanity_check_ratio(out, "fp8_vs_bf16", 1.3,
                       "v5e has no FP8 MXU: same-FLOP GEMMs, quantize "
                       "is pure overhead")
    if guarded:
        out["timing_guarded"] = guarded
    return out


def bench_ln_mlp(B=2, S=2048, H=4096, FFN=14336):
    """Ladder #2: LayerNormMLP (RMSNorm + gated-SiLU MLP) fwd+bwd,
    FP8 HYBRID (E4M3 fwd / E5M2 bwd via DelayedScaling) vs BF16."""
    gamma = jnp.ones((H,), jnp.float32)
    k1 = _normal(3, (H, 2, FFN), scale=0.02)
    k2 = _normal(4, (FFN, H), scale=0.02)
    # fwd: gated up-proj (H -> 2*FFN) + down-proj (FFN -> H); bwd adds
    # dgrad + wgrad per GEMM => 3x the forward GEMM FLOPs.
    flops = 3 * (2.0 * B * S * H * 2 * FFN + 2.0 * B * S * FFN * H)

    def make_step(cached=False):
        def step(c, params):
            k1, k2, gamma, qsets, caches = params

            def loss(x, kk1, kk2, g):
                y = te.layernorm_mlp(
                    x, g, None, kk1, kk2, norm_type="rmsnorm",
                    activation_type="swiglu", quantizer_sets=qsets,
                    kernel_caches=caches if cached else None)
                return jnp.sum(y.astype(jnp.float32))
            grads = jax.grad(loss, argnums=(0, 1, 2, 3))(c, k1, k2, gamma)
            return chain_carry(c, grads)
        return step

    mk = te.QuantizerFactory.create_set
    recipe = te.DelayedScaling(amax_history_len=16)
    qsets = (mk(recipe), mk(recipe))
    # Microbatch variant: weights quantized once per optimizer step
    # (the reference's is_first_microbatch FP8 weight workspace).
    from transformerengine_tpu.quantize.microbatch import quantize_kernel
    caches = (quantize_kernel(k1.reshape(H, 2 * FFN), qsets[0])[0],
              quantize_kernel(k2, qsets[1])[0])
    t, guarded = _timed(
        {"fp8": (make_step(), (k1, k2, gamma, qsets, caches)),
         "fp8_mb": (make_step(cached=True), (k1, k2, gamma, qsets, caches)),
         "bf16": (make_step(), (k1, k2, gamma, (mk(None), mk(None)),
                                caches))},
        lambda s: _normal(s, (B, S, H)), n_short=2, n_long=8)
    out = {"fp8_step_ms": round(t["fp8"] * 1e3, 3),
           "fp8_microbatch_step_ms": round(t["fp8_mb"] * 1e3, 3),
           "bf16_step_ms": round(t["bf16"] * 1e3, 3),
           "fp8_tflops": round(flops / t["fp8"] / 1e12, 1),
           "fp8_vs_bf16": round(t["bf16"] / t["fp8"], 3),
           "fp8_microbatch_vs_bf16": round(t["bf16"] / t["fp8_mb"], 3)}
    sanity_check_ratio(out, "fp8_microbatch_vs_bf16", 1.3,
                       "v5e has no FP8 MXU")
    sanity_check_ratio(out, "fp8_vs_bf16", 1.3,
                       "v5e has no FP8 MXU: same-FLOP GEMMs, quantize "
                       "is pure overhead")
    if guarded:
        out["timing_guarded"] = guarded
    return out


def bench_flash_prefill(B=4, S=2048, Hq=32, Hkv=8, D=128):
    """Flash-attention forward microbench (prefill shape, causal GQA).
    The TFLOP/s here gates TTFT; reference analog:
    benchmarks/attention/benchmark_attention.py.

    A plain big bf16 GEMM is interleaved as a drift calibrator: the
    tunnel's absolute throughput wanders ~2.5x across windows, so
    ``pct_of_gemm`` (flash TFLOP/s over same-window GEMM TFLOP/s) is
    the number that survives; absolutes are window luck."""
    from transformerengine_tpu.attention import AttnMaskType, fused_attn
    k = _normal(11, (B, S, Hkv, D))
    v = _normal(12, (B, S, Hkv, D))
    # causal: ~half the S^2 pairs
    flops = 2 * 2.0 * B * Hq * S * S * D / 2

    def flash_step(q, params):
        kk, vv = params
        o = fused_attn([q, kk, vv], attn_mask_type=AttnMaskType.CAUSAL,
                       is_training=False)
        return chain_carry(q, o)

    # Calibrator GEMM reuses the flash carry reshaped to 2D: carry is
    # (B, S, Hq, D) -> (B*S, Hq*D) = (8192, 4096).
    GM, GK, GN = B * S, Hq * D, 4096
    gw = _normal(13, (GK, GN), scale=0.02)
    gemm_flops = 2.0 * GM * GK * GN

    def gemm_step(c, w):
        y = jnp.dot(c.reshape(GM, GK), w,
                    preferred_element_type=jnp.float32)
        return chain_carry(c, y.astype(jnp.bfloat16))

    t, guarded = _timed(
        {"flash": (flash_step, (k, v)), "gemm": (gemm_step, gw)},
        lambda s: _normal(s, (B, S, Hq, D)), n_short=2, n_long=8)
    timing = ("xprof_device" if jax.default_backend() == "tpu"
              else "wall_marginal")
    tflops = flops / t["flash"] / 1e12
    gemm_tflops = gemm_flops / t["gemm"] / 1e12
    out = {"tflops": round(tflops, 1),
           "ms": round(t["flash"] * 1e3, 3),
           "gemm_tflops": round(gemm_tflops, 1),
           "pct_of_gemm": round(100.0 * tflops / gemm_tflops, 1),
           "timing": timing}
    if guarded:
        out["timing_guarded"] = guarded
    return out


def bench_moe_mlp(B=2, S=2048, H=4096, F=7168, E=8, topk=2):
    """Mixtral-geometry routed expert MLP (router -> dispatch -> grouped
    gated MLP -> combine), fwd+bwd, MXFP8 block-scaled grouped GEMM vs
    BF16 (the reference's Mixtral MXFP8 grouped-MLP headline,
    BASELINE.md 4.56x row; jax/moe.py + cublaslt_grouped_gemm.cu).
    F is half of 8x7B's 14336: full-size expert weights + grads for BOTH
    interleaved variants + the MXFP8 dequant temps exceed one chip's
    16 GB HBM."""
    from transformerengine_tpu.moe import moe

    router = _normal(31, (H, E), jnp.float32, scale=0.02)
    w_up = _normal(32, (E, H, 2 * F), scale=0.02)
    w_down = _normal(33, (E, F, H), scale=0.02)
    T = B * S
    # Dispatched rows = T*topk; gated up (H -> 2F) + down (F -> H),
    # fwd + dgrad + wgrad per GEMM => 3x forward FLOPs.
    flops = 3 * (2.0 * T * topk * H * 2 * F + 2.0 * T * topk * F * H)

    def make_step(qsets, cached=False):
        def step(c, params):
            w_up, w_down, caches = params

            def loss(x, wu, wd):
                y, aux = moe(x, router, wu, wd, topk=topk,
                             activation_type="swiglu",
                             quantizer_sets=qsets,
                             kernel_caches=caches if cached else None)
                return jnp.sum(y.astype(jnp.float32)) + aux
            grads = jax.grad(loss, argnums=(0, 1, 2))(c, w_up, w_down)
            return chain_carry(c, grads)
        return step

    mk = te.QuantizerFactory.create_set
    mx = (mk(te.MXFP8BlockScaling()), mk(te.MXFP8BlockScaling()))
    # Microbatch variant: weights quantized once per optimizer step
    # (grad accumulation / is_first_microbatch — the reference's Mixtral
    # runs exactly this way); the uncached variant pays the full
    # per-step weight quantize.
    from transformerengine_tpu.quantize.microbatch import (
        quantize_grouped_kernel)
    caches = (quantize_grouped_kernel(w_up, mx[0])[0],
              quantize_grouped_kernel(w_down, mx[1])[0])
    t, guarded = _timed(
        {"mxfp8": (make_step(mx), (w_up, w_down, caches)),
         "mxfp8_mb": (make_step(mx, cached=True), (w_up, w_down, caches)),
         "bf16": (make_step((mk(None), mk(None))),
                  (w_up, w_down, caches))},
        lambda s: _normal(s, (T, H)), n_short=2, n_long=6)
    out = {"mxfp8_step_ms": round(t["mxfp8"] * 1e3, 3),
           "mxfp8_microbatch_step_ms": round(t["mxfp8_mb"] * 1e3, 3),
           "bf16_step_ms": round(t["bf16"] * 1e3, 3),
           "mxfp8_tflops": round(flops / t["mxfp8"] / 1e12, 1),
           "mxfp8_vs_bf16": round(t["bf16"] / t["mxfp8"], 3),
           "mxfp8_microbatch_vs_bf16": round(t["bf16"] / t["mxfp8_mb"], 3)}
    sanity_check_ratio(out, "mxfp8_vs_bf16", 1.3,
                       "v5e has no FP8 MXU")
    if guarded:
        out["timing_guarded"] = guarded
    return out


def bench_mxfp8_layer(B=4, S=2048, H=4096, FFN=14336, heads=32, kv=8):
    """Ladder #4: TransformerLayer forward (prefill shape) under MXFP8
    block scaling vs BF16."""
    from transformerengine_tpu.flax import TransformerLayer

    layer = TransformerLayer(
        hidden_size=H, mlp_hidden_size=FFN, num_attention_heads=heads,
        num_gqa_groups=kv, norm_type="rmsnorm", mlp_activations="swiglu",
        use_bias=False, enable_rotary_pos_emb=True, max_seq_len=S)
    x0 = _normal(21, (B, S, H))

    def make_step(recipe):
        # The autocast context is consulted at TRACE time, so it wraps
        # the apply inside the step body (tracing happens inside the
        # shared interleaved-timing jit, outside this function).
        def step(c, variables):
            with te.autocast(enabled=recipe is not None, recipe=recipe):
                y = layer.apply(variables, c)
            return chain_carry(c, y)
        return step

    mx_recipe = te.MXFP8BlockScaling()
    with te.autocast(enabled=True, recipe=mx_recipe):
        mx_vars = jax.jit(layer.init)(jax.random.PRNGKey(1), x0)
        # Prefill is inference-shaped: quantize the weights ONCE via the
        # kernel_cache collection (is_first_microbatch semantics) so the
        # steady-state step doesn't re-quantize 300 MB of kernels.
        _, cache = jax.jit(
            lambda v, x: layer.apply(v, x, mutable=["kernel_cache"])
        )(mx_vars, x0)
        mx_vars = {**mx_vars, **cache}
    bf_vars = jax.jit(layer.init)(jax.random.PRNGKey(1), x0)

    t, guarded = _timed(
        {"mxfp8": (make_step(mx_recipe), mx_vars),
         "bf16": (make_step(None), bf_vars)},
        lambda s: _normal(s, (B, S, H)), n_short=2, n_long=6)
    out = {"mxfp8_ms": round(t["mxfp8"] * 1e3, 3),
           "bf16_ms": round(t["bf16"] * 1e3, 3),
           "mxfp8_vs_bf16": round(t["bf16"] / t["mxfp8"], 3)}
    sanity_check_ratio(out, "mxfp8_vs_bf16", 1.3,
                       "v5e has no FP8 MXU")
    if guarded:
        out["timing_guarded"] = guarded
    return out


def bench_convergence(steps=150, tail=20):
    """Measured perplexity/loss delta vs BF16 on the real chip (the
    north star's 'match TE's no-significant-difference envelope',
    BASELINE.md; reference README.rst:379). Trains the tiny Llama stack
    on a fixed batch for ``steps`` under each recipe and reports the
    final-``tail``-step mean loss deltas. CPU covers this in
    tests/test_convergence.py; this rung pins the number on hardware."""
    import dataclasses

    import numpy as np
    import optax

    from transformerengine_tpu.flax.module import QUANTIZE_META
    from transformerengine_tpu.models.llama import (
        LLAMA_TINY, LlamaModel, cross_entropy_loss)

    def train(recipe, seed=0, low_prec_opt=False):
        cfg = dataclasses.replace(LLAMA_TINY, num_layers=2)
        model = LlamaModel(config=cfg)
        tokens = jax.random.randint(
            jax.random.PRNGKey(seed), (4, 64), 0, cfg.vocab_size)
        if low_prec_opt:
            # bf16 params + int16 remainder masters + bf16 exp_avg
            # (reference: FusedAdam store_param_remainders + fp16
            # exp_avg) — the at-scale memory configuration; trajectory
            # must stay inside the recipe's convergence envelope.
            from transformerengine_tpu.optimizers import fused_adam
            opt = fused_adam(1e-3, store_param_remainders=True,
                             exp_avg_dtype=jnp.bfloat16)
        else:
            opt = optax.adam(1e-3)
        with te.autocast(enabled=recipe is not None, recipe=recipe):
            variables = jax.jit(model.init)(jax.random.PRNGKey(seed + 1),
                                            tokens)
            params = variables["params"]
            if low_prec_opt:
                params = jax.tree.map(
                    lambda p: p.astype(jnp.bfloat16)
                    if p.dtype == jnp.float32 else p, params)
            qmeta = variables.get(QUANTIZE_META, {})
            opt_state = opt.init(params)

            @jax.jit
            def step(params, qmeta, opt_state):
                def loss_fn(params, qmeta):
                    v = {"params": params}
                    if qmeta:
                        v[QUANTIZE_META] = qmeta
                    logits = model.apply(v, tokens)
                    return cross_entropy_loss(logits[:, :-1], tokens[:, 1:])

                if qmeta:
                    loss, (gp, gq) = jax.value_and_grad(
                        loss_fn, argnums=(0, 1))(params, qmeta)
                else:
                    loss, gp = jax.value_and_grad(loss_fn)(params, qmeta)
                    gq = qmeta
                if low_prec_opt:
                    new_params, opt_state = opt.step(gp, opt_state, params)
                    return new_params, gq, opt_state, loss
                updates, opt_state = opt.update(gp, opt_state, params)
                return (optax.apply_updates(params, updates), gq, opt_state,
                        loss)

            losses = []
            for _ in range(steps):
                params, qmeta, opt_state, loss = step(params, qmeta,
                                                      opt_state)
                losses.append(loss)
        return np.asarray(jax.device_get(losses), np.float32)

    bf16 = train(None)
    out = {"bf16_final_loss": round(float(bf16[-tail:].mean()), 4),
           "steps": steps}
    for name, recipe in (
            ("fp8", te.DelayedScaling(amax_history_len=16)),
            ("mxfp8", te.MXFP8BlockScaling()),
            ("nvfp4", te.NVFP4BlockScaling())):
        try:
            tr = train(recipe)
            d = float(tr[-tail:].mean() - bf16[-tail:].mean())
            out[f"{name}_final_loss"] = round(float(tr[-tail:].mean()), 4)
            out[f"{name}_loss_delta"] = round(d, 4)
        except Exception as e:   # one recipe failing must not sink the rung
            out[f"{name}_error"] = str(e)[:160]
    try:
        # fp8 recipe + low-precision optimizer (bf16 params, int16
        # remainder masters, bf16 exp_avg): the reference FusedAdam
        # at-scale memory configuration, checked against the same
        # envelope (VERDICT r4 #5).
        tr = train(te.DelayedScaling(amax_history_len=16),
                   low_prec_opt=True)
        out["fp8_lpadam_final_loss"] = round(float(tr[-tail:].mean()), 4)
        out["fp8_lpadam_loss_delta"] = round(
            float(tr[-tail:].mean() - bf16[-tail:].mean()), 4)
    except Exception as e:
        out["fp8_lpadam_error"] = str(e)[:160]
    return out
