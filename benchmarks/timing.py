"""Tunnel-safe timing primitives for TPU benchmarks.

The axon TPU tunnel memoizes repeated identical computations and
``block_until_ready`` does not wait for real device execution, so naive
timing loops measure RPC caching, not the TPU. Every benchmark here uses
the validated pattern (see memory note axon-tpu-bench-quirks and
CLAUDE.md "Benchmarking on the tunnel"):

1. chain steps through a ``lax.scan`` so step N+1 depends on step N
   (the chain cannot be served from a result cache),
2. derive a fresh input from a per-call host-side seed so repeated
   calls are distinct computations,
3. force materialization with a scalar host fetch (``float(...)``),
4. report the *marginal* time between a short and a long scan, which
   cancels dispatch, transfer, and memoization-constant overheads.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["chain_carry", "marginal_seconds_per_step",
           "marginal_seconds_interleaved", "median_call_seconds"]


def _safe_marginal(med_short, med_long, n_short, n_long):
    """(marginal seconds/step, guarded?) with a drift guard. The
    tunnel's absolute throughput can move ~2.5x BETWEEN the short and
    long reps, making the long chain appear as cheap as (or cheaper
    than) the short one; the raw difference then underflows and
    downstream TFLOP/s explodes (observed 7.7e7 TFLOP/s on the linear
    rung). When the marginal is non-positive or under 5% of the long
    chain's average per-step time, fall back to that average — a
    positive upper bound (it includes dispatch/transfer overhead)
    instead of a nonsense number — and flag it (``guarded=True``) so
    consumers can tell an upper bound from a real marginal (a workload
    whose true marginal is tiny relative to fixed overhead would
    otherwise be indistinguishable from a drifted run)."""
    m = (med_long - med_short) / (n_long - n_short)
    avg_long = med_long / n_long
    if m < 0.05 * avg_long:
        return avg_long, True
    return m, False


def chain_carry(carry: jax.Array, out) -> jax.Array:
    """Fold a negligible but real data dependency on ``out`` into
    ``carry`` so XLA cannot reorder or elide chained steps.

    The perturbation must be elementwise-NONLINEAR in the carry: a pure
    scalar rescale (``c * (1+eps)``) lets XLA's algebraic simplifier
    factor the scalar out of the downstream dot (``dot(c*s, w) ==
    s*dot(c, w)``) and collapse the whole scan to one matmul plus n
    scalar fixups — observed as >7x-over-roofline "TFLOP/s" on the
    linear rung.

    Only a leading slice is perturbed: the consumer of the next carry
    waits on the whole materialized buffer either way, and an XProf
    trace showed the full-array cos costing ~25% of a flash-attention
    step (0.84 ms of transcendentals per 33M-element carry). ``out`` is
    still fully reduced so none of its producers can be DCE'd."""
    leaves = [jnp.sum(l).astype(jnp.float32)
              for l in jax.tree_util.tree_leaves(out)]
    tag = sum(leaves) if leaves else jnp.float32(0)
    flat = carry.reshape(-1)
    n = min(flat.shape[0], 1024)
    head = flat[:n].astype(jnp.float32)
    head = (head + 1e-6 * jnp.cos(head + jnp.tanh(tag))).astype(carry.dtype)
    return jax.lax.dynamic_update_slice(flat, head, (0,)).reshape(
        carry.shape)


def marginal_seconds_per_step(
    step: Callable[[jax.Array], jax.Array],
    make_carry: Callable[[int], jax.Array],
    *,
    n_short: int = 2,
    n_long: int = 10,
    reps: int = 3,
) -> float:
    """Median marginal seconds per ``step``.

    ``step`` maps a carry array to the next carry (same shape/dtype) and
    must contain the full workload being measured; ``make_carry(seed)``
    builds a fresh initial carry on host for each call.
    """

    @partial(jax.jit, static_argnames="n")
    def run(c0, n):
        return jax.lax.scan(lambda c, _: (step(c), None), c0, None, length=n)[0]

    # Compile both lengths up front (outside the timed region).
    for n in (n_short, n_long):
        jnp.sum(run(make_carry(0), n)).block_until_ready()

    times = {}
    for n in (n_short, n_long):
        ts = []
        for r in range(reps):
            c0 = make_carry(1 + 31 * r + n)
            t0 = time.perf_counter()
            float(jnp.sum(run(c0, n)))  # host fetch forces execution
            ts.append(time.perf_counter() - t0)
        times[n] = sorted(ts)[len(ts) // 2]
    return _safe_marginal(times[n_short], times[n_long], n_short, n_long)[0]


def marginal_seconds_interleaved(
    variants: dict,
    make_carry: Callable[[int], jax.Array],
    *,
    n_short: int = 2,
    n_long: int = 10,
    reps: int = 3,
    with_flags: bool = False,
) -> dict:
    """Marginal seconds per step for several variants measured in ONE
    window, interleaved per repetition — the tunnel's absolute
    throughput drifts ~2.5x over tens of minutes, so A/B ratios are only
    trustworthy when A and B alternate (memory note
    axon-tunnel-throughput-drift).

    ``variants`` maps name -> (step, params) where ``step(carry, params)
    -> carry``. ``params`` is an arbitrary pytree passed as a real jit
    argument — large weights MUST ride here, not in a closure, or they
    are embedded as HLO constants and blow the remote-compile request
    body limit (observed HTTP 413 at ~350 MB of closed-over weights).
    Returns name -> marginal seconds/step, or name -> (seconds,
    guarded) when ``with_flags`` — ``guarded`` marks measurements where
    the drift guard replaced the marginal with the dispatch-inclusive
    per-step average (an upper bound, not a true marginal).
    """
    runs = {}
    for name, (stepf, params) in variants.items():
        @partial(jax.jit, static_argnames="n")
        def run(c0, params, n, _step=stepf):
            return jax.lax.scan(lambda c, _: (_step(c, params), None),
                                c0, None, length=n)[0]
        runs[name] = run

    for name, run in runs.items():
        for n in (n_short, n_long):
            jnp.sum(run(make_carry(0), variants[name][1], n)
                    ).block_until_ready()

    # On a real TPU, time the DEVICE lanes via XProf: host wall-clock
    # through the axon tunnel wanders +-25% and can even under-measure
    # (a 1.66 ms kernel read as 0.60 ms wall); device-lane durations are
    # stable, so interleaving is unnecessary. TE_TPU_BENCH_TIMING=wall
    # restores the wall-clock path.
    import os
    if (jax.default_backend() == "tpu"
            and os.environ.get("TE_TPU_BENCH_TIMING", "device") == "device"):
        from .xprof import profile
        out = {}
        for name, run in runs.items():
            busy = {}
            for n in (n_short, n_long):
                busy[n] = profile(
                    lambda n=n, run=run, name=name: float(jnp.sum(
                        run(make_carry(1 + n), variants[name][1], n))),
                    logdir=f"/tmp/te_xprof_bench_{name}")[1] / 1e6
            out[name] = _safe_marginal(busy[n_short], busy[n_long],
                                       n_short, n_long)
        if with_flags:
            return out
        return {name: v[0] for name, v in out.items()}

    times = {name: {n: [] for n in (n_short, n_long)} for name in runs}
    for r in range(reps):
        for n in (n_short, n_long):
            for name, run in runs.items():
                c0 = make_carry(1 + 31 * r + n + 7 * hash(name) % 1000)
                t0 = time.perf_counter()
                float(jnp.sum(run(c0, variants[name][1], n)))
                times[name][n].append(time.perf_counter() - t0)

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    out = {
        name: _safe_marginal(med(t[n_short]), med(t[n_long]),
                             n_short, n_long)
        for name, t in times.items()
    }
    if with_flags:
        return out
    return {name: v[0] for name, v in out.items()}


def median_call_seconds(fn: Callable[[int], float], reps: int = 5) -> float:
    """Median wall time of ``fn(seed)``; ``fn`` must itself fetch a
    scalar to host (it returns that scalar, ignored). For end-to-end
    latencies (e.g. TTFT) where marginal timing does not apply."""
    fn(0)  # warm / compile
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        fn(1 + 17 * r)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]
