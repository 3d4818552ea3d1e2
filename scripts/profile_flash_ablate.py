"""Intra-kernel cost breakdown of the flash fwd kernel via ablations.

All variants measured interleaved in ONE window (drift-immune
relatives). Each variant sets flash_attention.ABLATE at TRACE time (the
step closure body runs while jit traces it), so each jitted program
bakes in its own kernel variant. Timing-only — ablated outputs are
numerically wrong by construction.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.timing import chain_carry, marginal_seconds_interleaved


def _normal(seed, shape, dtype=jnp.bfloat16, scale=1.0):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape) * scale
            ).astype(dtype)


def main():
    B, S, Hq, Hkv, D = 4, 2048, 32, 8, 128
    from transformerengine_tpu.attention import AttnMaskType, fused_attn
    import transformerengine_tpu.ops.flash_attention as fa

    k = _normal(11, (B, S, Hkv, D))
    v = _normal(12, (B, S, Hkv, D))
    flops = 2 * 2.0 * B * Hq * S * S * D / 2

    def make_step(ablate):
        def step(q, params):
            fa.ABLATE = frozenset(ablate)   # trace-time
            kk, vv = params
            o = fused_attn([q, kk, vv],
                           attn_mask_type=AttnMaskType.CAUSAL,
                           is_training=False)
            return chain_carry(q, o)
        return step

    GM, GK, GN = B * S, Hq * D, 4096
    gw = _normal(13, (GK, GN), scale=0.02)
    gemm_flops = 2.0 * GM * GK * GN

    def gemm_step(c, w):
        y = jnp.dot(c.reshape(GM, GK), w, preferred_element_type=jnp.float32)
        return chain_carry(c, y.astype(jnp.bfloat16))

    variants = {
        "full": (make_step(()), (k, v)),
        "nomask": (make_step(("nomask",)), (k, v)),
        "nomax": (make_step(("nomax",)), (k, v)),
        "noexp": (make_step(("noexp",)), (k, v)),
        "nomax_noexp": (make_step(("nomax", "noexp")), (k, v)),
        "nopv": (make_step(("nopv",)), (k, v)),
        "bare": (make_step(("nomask", "nomax", "noexp", "nopv")), (k, v)),
        "gemm": (gemm_step, gw),
    }
    t = marginal_seconds_interleaved(
        variants, lambda s: _normal(s, (B, S, Hq, D)), n_short=2, n_long=8)
    fa.ABLATE = frozenset()
    gemm_tflops = gemm_flops / t["gemm"] / 1e12
    out = {"gemm_tflops": round(gemm_tflops, 1)}
    for name in variants:
        if name == "gemm":
            continue
        out[name] = {
            "ms": round(t[name] * 1e3, 3),
            "tflops": round(flops / t[name] / 1e12, 1),
            "pct_of_gemm": round(100.0 * flops / t[name] / 1e12
                                 / gemm_tflops, 1),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
