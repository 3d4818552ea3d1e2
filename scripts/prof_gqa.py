"""Profile the GQA group-packed fwd prototype (device-lane timing)."""
import functools, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "."); sys.path.insert(0, "scripts")
from exp_flash_variants import B, D, HKV, HQ, S, flash_gqa
from benchmarks.xprof import profile

N = 8

def go(bq, bk, causal=True):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)
    def step(c, _):
        o = flash_gqa(c, k, v, bq, bk, causal)
        return (o * jnp.bfloat16(0.1)).astype(jnp.bfloat16), ()
    @jax.jit
    def run(q):
        out, _ = jax.lax.scan(step, q, None, length=N)
        return jnp.sum(out.astype(jnp.float32))
    # correctness spot check vs reference
    import numpy as np
    o = flash_gqa(q, k, v, bq, bk, causal)
    kk = jnp.repeat(k, HQ // HKV, axis=1)
    vv = jnp.repeat(v, HQ // HKV, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kk.astype(jnp.float32))
    if causal:
        mask = jnp.tril(jnp.ones((S, S), bool))
        s = jnp.where(mask, s, -1e30)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s * 1.4426950408889634, axis=-1), vv.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref)))
    float(run(q))
    _, busy = profile(lambda: float(run(q + jnp.bfloat16(0.25))))
    flops = 4 * B * HQ * S * S * D * (0.5 if causal else 1.0) * N
    print(f"gqa bq={bq} bk={bk} causal={causal}: {busy/N/1e3:.2f} ms/step "
          f"{flops/(busy*1e-6)/1e12:.1f} TF/s  maxerr={err:.4f}")

if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    for bq, bk in [(512, 1024), (512, 512), (1024, 1024), (256, 512), (512, 2048), (256, 1024)]:
        try:
            go(bq, bk)
        except Exception as e:
            print(f"gqa {bq}x{bk}: FAILED {type(e).__name__}: {str(e)[:200]}")
