"""A/B one INNER_K value for the flash fwd kernel on the real TPU.

Run via scripts/sweep_flash_inner.sh — one subprocess per INNER_K value
(the knob is read at module import). Flash and a plain GEMM calibrator
are interleaved in the same window, so pct_of_gemm is drift-immune
(CLAUDE.md: the axon tunnel's absolute throughput wanders ~2.5x).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.timing import chain_carry, marginal_seconds_interleaved


def _normal(seed, shape, dtype=jnp.bfloat16, scale=1.0):
    # ON DEVICE — a host-numpy carry costs a ~64 MB host->device tunnel
    # transfer inside every timed call, swamping the marginal (measured
    # as a bogus ~60x slowdown on every variant).
    return (jax.random.normal(jax.random.PRNGKey(seed), shape) * scale
            ).astype(dtype)


def main():
    B, S, Hq, Hkv, D = 4, 2048, 32, 8, 128
    mode = os.environ.get("PROF_MODE", "fwd")
    from transformerengine_tpu.attention import AttnMaskType, fused_attn
    import transformerengine_tpu.ops.flash_attention as fa

    k = _normal(11, (B, S, Hkv, D))
    v = _normal(12, (B, S, Hkv, D))
    fwd_flops = 2 * 2.0 * B * Hq * S * S * D / 2

    if mode == "fwd":
        flops = fwd_flops

        def flash_step(q, params):
            kk, vv = params
            o = fused_attn([q, kk, vv], attn_mask_type=AttnMaskType.CAUSAL,
                           is_training=False)
            return chain_carry(q, o)
    else:
        # fwd+bwd: 1x fwd + ~2.5x bwd (dq, dkv kernels recompute scores)
        flops = fwd_flops * 3.5

        def loss(q, kk, vv):
            o = fused_attn([q, kk, vv], attn_mask_type=AttnMaskType.CAUSAL,
                           is_training=True)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def flash_step(q, params):
            kk, vv = params
            dq = jax.grad(loss)(q, kk, vv)
            return chain_carry(q, dq)

    GM, GK, GN = B * S, Hq * D, 4096
    gw = _normal(13, (GK, GN), scale=0.02)
    gemm_flops = 2.0 * GM * GK * GN

    def gemm_step(c, w):
        y = jnp.dot(c.reshape(GM, GK), w, preferred_element_type=jnp.float32)
        return chain_carry(c, y.astype(jnp.bfloat16))

    t = marginal_seconds_interleaved(
        {"flash": (flash_step, (k, v)), "gemm": (gemm_step, gw)},
        lambda s: _normal(s, (B, S, Hq, D)), n_short=2, n_long=8)
    tflops = flops / t["flash"] / 1e12
    gemm_tflops = gemm_flops / t["gemm"] / 1e12
    print(json.dumps({
        "mode": mode,
        "inner_k": fa.INNER_K,
        "flash_tflops": round(tflops, 1),
        "flash_ms": round(t["flash"] * 1e3, 3),
        "gemm_tflops": round(gemm_tflops, 1),
        "pct_of_gemm": round(100.0 * tflops / gemm_tflops, 1),
    }))


if __name__ == "__main__":
    main()
