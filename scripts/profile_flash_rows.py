"""Flash fwd: packed-rows cap x block_k sweep + dense-vs-enumerated
grid, in ONE window. MAX_ROWS is patched at trace time (step closures
run while jit traces)."""
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
    import transformerengine_tpu.ops.flash_attention as fa
    from transformerengine_tpu.attention import AttnMaskType

    k = _normal(11, (B, S, Hkv, D))
    v = _normal(12, (B, S, Hkv, D))
    flops = 2 * 2.0 * B * Hq * S * S * D / 2

    def make_step(bq, bk, max_rows, dense=False):
        def step(q, params):
            fa.MAX_ROWS = max_rows          # trace-time
            kk, vv = params
            kwargs = {}
            if dense:
                # a traced q offset forces the dense grid
                kwargs["q_position_offset"] = jnp.zeros((), jnp.int32)
            o = fa.flash_attention(q, kk, vv,
                                   attn_mask_type=AttnMaskType.CAUSAL,
                                   block_q=bq, block_k=bk, **kwargs)
            return chain_carry(q, o)
        return step

    variants = {
        "r1024_bk1024": (make_step(512, 1024, 1024), (k, v)),
        "r2048_bk1024": (make_step(512, 1024, 2048), (k, v)),
        "r2048_bk512": (make_step(512, 512, 2048), (k, v)),
        "r4096_bk512": (make_step(1024, 512, 4096), (k, v)),
        "r1024_bk1024_dense": (make_step(512, 1024, 1024, True), (k, v)),
    }

    GM, GK, GN = B * S, Hq * D, 4096
    gw = _normal(13, (GK, GN), scale=0.02)
    gemm_flops = 2.0 * GM * GK * GN

    def gemm_step(c, w):
        y = jnp.dot(c.reshape(GM, GK), w, preferred_element_type=jnp.float32)
        return chain_carry(c, y.astype(jnp.bfloat16))

    variants["gemm"] = (gemm_step, gw)
    t = marginal_seconds_interleaved(
        variants, lambda s: _normal(s, (B, S, Hq, D)), n_short=2, n_long=8)
    fa.MAX_ROWS = 1024
    gemm_tflops = gemm_flops / t["gemm"] / 1e12
    out = {"gemm_tflops": round(gemm_tflops, 1)}
    for name in variants:
        if name == "gemm":
            continue
        tf = flops / t[name] / 1e12
        out[name] = {"ms": round(t[name] * 1e3, 3), "tflops": round(tf, 1),
                     "pct_of_gemm": round(100.0 * tf / gemm_tflops, 1)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
