"""XProf device-time check of the production flash kernel."""
import functools, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "."); sys.path.insert(0, "scripts")
from transformerengine_tpu.attention import AttnMaskType
from transformerengine_tpu.ops.flash_attention import flash_attention
from benchmarks.xprof import profile

B, S, HQ, HKV, D, N = 4, 2048, 32, 8, 128, 8

def go(bq, bk, bwd=False):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, HQ, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, HKV, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, HKV, D), jnp.bfloat16)
    attn = functools.partial(flash_attention, attn_mask_type=AttnMaskType.CAUSAL,
                             block_q=bq, block_k=bk)
    if bwd:
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)
        def step(c, _):
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(c, k, v)
            return (c + 1e-6 * dq).astype(jnp.bfloat16), ()
    else:
        def step(c, _):
            return (attn(c, k, v) * jnp.bfloat16(0.1)).astype(jnp.bfloat16), ()
    @jax.jit
    def run(q):
        out, _ = jax.lax.scan(step, q, None, length=N)
        return jnp.sum(out.astype(jnp.float32))
    float(run(q))
    _, busy = profile(lambda: float(run(q + jnp.bfloat16(0.25))))
    flops = 4 * B * HQ * S * S * D * 0.5 * N * (3.5 if bwd else 1.0)
    print(f"{'bwd' if bwd else 'fwd'} bq={bq} bk={bk}: {busy/N/1e3:.2f} ms/step "
          f"{flops/(busy*1e-6)/1e12:.1f} TF/s")

if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    pairs = [int(x) for x in sys.argv[2:]]
    for bq, bk in zip(pairs[::2], pairs[1::2]):
        go(bq, bk, bwd=(mode == "bwd"))
