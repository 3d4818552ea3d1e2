"""Profile a jitted callable on the TPU and report device-lane op times.

Parses the perfetto trace.json.gz that jax.profiler writes and sums
durations per op name on TPU device lanes (the reliable timing source
through the axon tunnel — host wall-clock is noisy, see CLAUDE.md).
"""
import glob
import gzip
import json
import os
import shutil
from collections import defaultdict

import jax


def profile(fn, logdir="/tmp/te_xprof"):
    """Run fn() under a trace; return {op_name: total_us} on device lanes
    plus the total device-busy time."""
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    fn()
    jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace found under {logdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device lanes: process metadata names containing "TPU" (e.g.
    # "/device:TPU:0" or the vm trace lane)
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name.upper() or "device" in name.lower():
                device_pids.add(e["pid"])
    per_op = defaultdict(float)
    spans = []
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            # skip nested "steps"/annotation lanes: keep leaf op events
            per_op[e["name"]] += e.get("dur", 0.0)
            spans.append((e["ts"], e["ts"] + e.get("dur", 0.0)))
    total_busy = sum(b - a for a, b in _merge(spans))
    return dict(per_op), total_busy


def _merge(spans):
    out = []
    for a, b in sorted(spans):
        if out and a <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


def report(per_op, total_busy, top=25, min_us=0.0):
    print(f"device busy: {total_busy/1e3:.3f} ms")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        if us >= min_us:
            print(f"  {us/1e3:9.3f} ms  {name[:110]}")


def device_marginal_seconds(run, make_arg, n_short=2, n_long=8,
                            logdir="/tmp/te_xprof_marginal"):
    """Marginal DEVICE seconds per scan step of ``run(arg, n)`` (jitted,
    static n): traces a short and a long chained scan and differences
    the device-busy time. Device-lane durations are stable through the
    axon tunnel while host wall-clock wanders +-25% (and can even
    under-measure, e.g. 0.60 ms wall for a kernel XProf pins at
    1.66 ms), so ladder rungs use this when a real TPU is attached."""
    import jax.numpy as jnp

    for n in (n_short, n_long):
        jnp.sum(run(make_arg(n), n)).block_until_ready()
    busy = {}
    for n in (n_short, n_long):
        _, busy[n] = profile(lambda n=n: float(jnp.sum(run(make_arg(n), n))),
                             logdir=logdir)
    return (busy[n_long] - busy[n_short]) / (n_long - n_short) / 1e6
