"""Experiment: MXFP8 quantize kernel variants (run on TPU).

Current kernel builds the payload by lane-slicing each 32-block and
concatenating 16 pieces — the pattern that Mosaic lowered as serial
relayouts in scaled_matmul. Variant B expands the scale grid across
lanes with a small 0/1 MXU matmul and multiplies once, no payload
concat.

    python scripts/exp_mxfp8_quant.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from transformerengine_tpu.ops.quantize_kernels import (  # noqa: E402
    _e8m0_exp, _mxfp8_pair, E8M0_BIAS, mxfp8_quantize_1x)
from transformerengine_tpu.quantize.dtypes import float8_e4m3  # noqa: E402


def _kernel_b(expand_ref, x_ref, row_ref, srow_ref, *, q_dtype,
              emax_elem: int):
    x = x_ref[...].astype(jnp.float32)            # (tm, tn)
    xt = x.T
    tn = x.shape[1]
    es = []
    for ib in range(tn // 32):
        blk = xt[ib * 32:(ib + 1) * 32, :]
        amax_t = jnp.max(jnp.abs(blk), axis=0, keepdims=True)   # (1, tm)
        es.append(_e8m0_exp(amax_t, emax_elem))
    e_t = jnp.concatenate(es, axis=0)             # (tn//32, tm) int32
    srow_ref[...] = e_t + E8M0_BIAS
    s_inv_t = jnp.exp2(-e_t.astype(jnp.float32))  # (tn//32, tm)
    sexp = jax.lax.dot_general(
        s_inv_t.T, expand_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (tm, tn), exact
    from transformerengine_tpu.quantize.dtypes import dtype_max
    q_max = dtype_max(q_dtype)
    row_ref[...] = jnp.clip(x * sexp, -q_max, q_max).astype(q_dtype)


def quantize_1x_b(x2d, q_dtype=float8_e4m3, tile=(256, 512)):
    m, n = x2d.shape
    tm, tn = min(tile[0], m), min(tile[1], n)
    grid = (m // tm, n // tn)
    expand = jnp.repeat(jnp.eye(tn // 32, dtype=jnp.float32), 32, axis=1)
    row, s_t = pl.pallas_call(
        functools.partial(_kernel_b, q_dtype=q_dtype, emax_elem=8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn // 32, tn), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // 32, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), q_dtype),
            jax.ShapeDtypeStruct((n // 32, m), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(expand, x2d)
    return row, s_t.T.astype(jnp.uint8)


def _kernel_c(expand_ref, x_ref, row_ref, srow_ref, *, q_dtype,
              emax_elem: int):
    # No full transpose: block amax from LANE slices of x; only the
    # (tm, tn//32) scale grid is transposed for the output layout.
    x = x_ref[...].astype(jnp.float32)            # (tm, tn)
    tn = x.shape[1]
    es = []
    for ib in range(tn // 32):
        amax = jnp.max(jnp.abs(x[:, ib * 32:(ib + 1) * 32]), axis=1,
                       keepdims=True)             # (tm, 1)
        es.append(_e8m0_exp(amax, emax_elem))
    e = jnp.concatenate(es, axis=1)               # (tm, tn//32)
    srow_ref[...] = e.T + E8M0_BIAS
    sexp = jax.lax.dot_general(
        jnp.exp2(-e.astype(jnp.float32)), expand_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    from transformerengine_tpu.quantize.dtypes import dtype_max
    q_max = dtype_max(q_dtype)
    row_ref[...] = jnp.clip(x * sexp, -q_max, q_max).astype(q_dtype)


def quantize_1x_c(x2d, q_dtype=float8_e4m3, tile=(256, 512)):
    m, n = x2d.shape
    tm, tn = min(tile[0], m), min(tile[1], n)
    grid = (m // tm, n // tn)
    expand = jnp.repeat(jnp.eye(tn // 32, dtype=jnp.float32), 32, axis=1)
    row, s_t = pl.pallas_call(
        functools.partial(_kernel_c, q_dtype=q_dtype, emax_elem=8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn // 32, tn), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // 32, tm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), q_dtype),
            jax.ShapeDtypeStruct((n // 32, m), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(expand, x2d)
    return row, s_t.T.astype(jnp.uint8)


def timeit(fn, x, iters=20):
    # chain through the payload so the tunnel can't cache
    def step(c, _):
        row, s = fn(c)
        c2 = c + row.astype(jnp.bfloat16) * jnp.bfloat16(1e-6) \
            + jnp.bfloat16(1e-8) * s.sum().astype(jnp.bfloat16)
        return c2, ()

    @jax.jit
    def run(c, n_arr):
        c, _ = jax.lax.scan(step, c, n_arr)
        return c

    short = jnp.zeros((4,))
    long_ = jnp.zeros((4 + iters,))
    float(run(x, short).sum())
    float(run(x, long_).sum())
    ts = []
    for k in range(3):
        xk = x + jnp.bfloat16(k * 1e-3)
        t0 = time.perf_counter()
        float(run(xk, short).sum())
        t1 = time.perf_counter()
        float(run(xk, long_).sum())
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / iters)
    return sorted(ts)[1]


def main():
    for shape in [(8192, 14336), (114688, 4096), (8192, 4096)]:
        x = (jax.random.normal(jax.random.PRNGKey(0), shape) * 3
             ).astype(jnp.bfloat16)
        # bit-exactness of variant B vs current
        ra, sa = mxfp8_quantize_1x(x, colwise=False)
        rb, sb = quantize_1x_b(x)
        ok = (bool(jnp.array_equal(ra.astype(jnp.float32),
                                   rb.astype(jnp.float32)))
              and bool(jnp.array_equal(sa, sb)))
        nbytes = x.size * 2 + x.size * 1 + x.size // 32
        rc, sc = quantize_1x_c(x)
        okc = (bool(jnp.array_equal(ra.astype(jnp.float32),
                                    rc.astype(jnp.float32)))
               and bool(jnp.array_equal(sa, sc)))
        ta = timeit(lambda c: mxfp8_quantize_1x(c, colwise=False), x)
        tb = timeit(lambda c: quantize_1x_b(c), x)
        tc = timeit(lambda c: quantize_1x_c(c), x)
        tc2 = timeit(lambda c: quantize_1x_c(c, tile=(512, 1024)), x)
        print(f"{shape}: bitexact B={ok} C={okc}  "
              f"cur {ta*1e3:6.2f}ms({nbytes/ta/1e9:5.0f}GB/s) "
              f"B {tb*1e3:6.2f}ms({nbytes/tb/1e9:5.0f}GB/s) "
              f"C {tc*1e3:6.2f}ms({nbytes/tc/1e9:5.0f}GB/s) "
              f"C512x1024 {tc2*1e3:6.2f}ms({nbytes/tc2/1e9:5.0f}GB/s)")


if __name__ == "__main__":
    main()
