"""Calibrate wall-clock marginal timing + XProf against the v5e matmul
roofline (197 TF/s bf16)."""
import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "scripts")
from benchmarks.xprof import profile

N = 4096
def step(c, _):
    o = jnp.dot(c, w, preferred_element_type=jnp.float32)
    return (o * jnp.bfloat16(1e-3)).astype(jnp.bfloat16), ()

w = jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.bfloat16)
x = jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.bfloat16)

import functools
@functools.partial(jax.jit, static_argnums=1)
def run(x, n):
    out, _ = jax.lax.scan(step, x, None, length=n)
    return jnp.sum(out.astype(jnp.float32))

flops = 2 * N**3
for n in (4, 20):
    float(run(x, n))
times = {}
for n in (4, 20):
    ts = []
    for i in range(5):
        xx = x + jnp.bfloat16(0.01 * (i + 1))
        t0 = time.perf_counter(); float(run(xx, n)); ts.append(time.perf_counter() - t0)
    times[n] = sorted(ts)[len(ts)//2]
    print(f"n={n}: times {[f'{t*1e3:.1f}' for t in sorted(ts)]} ms")
dt = (times[20] - times[4]) / 16
print(f"wall marginal: {dt*1e3:.3f} ms/matmul -> {flops/dt/1e12:.1f} TF/s")

_, busy = profile(lambda: float(run(x + jnp.bfloat16(0.33), 16)))
print(f"xprof: {busy/16/1e3:.3f} ms/matmul -> {flops/(busy/16*1e-6)/1e12:.1f} TF/s")
