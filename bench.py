"""Benchmark entry point for the driver.

Prints ONE JSON line. The headline metric stays the BASELINE.json
north star (ladder #3): autoregressive FP8 DECODE tokens/sec/chip on an
8B-geometry Llama stack with FP8-resident weights and FP8 KV cache, vs
the same stack in BF16 (the reference's te_gemma KV-cache + CUDA-graph
+ FP8-weights decode, BASELINE.md 3.8x/9.3x rows). The rest of the
BASELINE measurement ladder — Linear microbench (#1), LayerNormMLP
block (#2), MXFP8 TransformerLayer prefill (#4), p50 TTFT and the
flash-attention prefill microbench — is reported in the same JSON
object under "ladder" (still one line).

Decode steps are inherently chained through the cache, which also
defeats the axon tunnel's result caching; the scalar token fetch forces
materialization, and per-step time is the marginal cost between a short
and a long jitted scan (see memory note axon-tpu-bench-quirks). The
other rungs use benchmarks/timing.py, the same pattern generalized.

Run `python bench.py --rungs linear,flash` to iterate on a subset.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time
import traceback

import jax
import jax.numpy as jnp


def _run(model, variables, tokens, lengths, ip, steps):
    from transformerengine_tpu.inference import decode_steps, prefill
    first, cache = prefill(model, variables, tokens, ip, lengths, 0.0)
    toks, _ = decode_steps(model, variables, cache, first, ip, steps, 0.0)
    return int(toks[0, -1])  # host fetch -> forces execution


def bench_decode_and_ttft():
    """Ladder #3 (north star) + p50 TTFT on the same 8B-geometry model."""
    import transformerengine_tpu as te
    from transformerengine_tpu.inference import InferenceParams
    from transformerengine_tpu.models.llama import (
        LLAMA_TINY, LlamaConfig, LlamaModel)
    from transformerengine_tpu.quantize.dtypes import float8_e4m3
    from transformerengine_tpu.quantize.prequant import prequantize_kernels

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = LlamaConfig(vocab_size=8192, hidden_size=4096,
                          intermediate_size=14336, num_layers=16,
                          num_attention_heads=32, num_kv_heads=8,
                          max_seq_len=1024, rope_base=500000.0)
        B, PROMPT, N_SHORT, N_LONG = 8, 512, 4, 24
    else:
        cfg = dataclasses.replace(LLAMA_TINY)
        B, PROMPT, N_SHORT, N_LONG = 2, 32, 2, 6

    model = LlamaModel(config=cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, PROMPT), 1,
                                cfg.vocab_size)
    lengths = jnp.full((B,), PROMPT, jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), tokens)

    def bench_variant(variables, kv_dtype):
        ip = InferenceParams(max_batch_size=B,
                             max_sequence_length=PROMPT + N_LONG + 8,
                             kv_cache_dtype=jnp.dtype(kv_dtype))
        # compile both scan lengths
        _run(model, variables, tokens, lengths, ip, N_SHORT)
        _run(model, variables, tokens, lengths, ip, N_LONG)
        if on_tpu:
            # Device-lane marginal (host wall-clock through the tunnel
            # wanders +-25%; see benchmarks/timing.py).
            from benchmarks.xprof import profile
            busy = {}
            for n in (N_SHORT, N_LONG):
                tk = tokens.at[:, 0].set((tokens[:, 0] + n)
                                         % cfg.vocab_size)
                busy[n] = profile(
                    lambda tk=tk, n=n: _run(model, variables, tk, lengths,
                                            ip, n),
                    logdir="/tmp/te_xprof_decode")[1] / 1e6
            per_step = (busy[N_LONG] - busy[N_SHORT]) / (N_LONG - N_SHORT)
        else:
            times = {}
            for n in (N_SHORT, N_LONG):
                ts = []
                for i in range(3):
                    # Distinct prompt per rep so the tunnel cannot serve
                    # the whole chain from its result cache.
                    tk = tokens.at[:, 0].set((tokens[:, 0] + 17 * i + n)
                                             % cfg.vocab_size)
                    t0 = time.perf_counter()
                    _run(model, variables, tk, lengths, ip, n)
                    ts.append(time.perf_counter() - t0)
                times[n] = sorted(ts)[1]
            per_step = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT)
        # p50 TTFT: prompt in -> first token fetched on host, measured
        # at the short scan so cache state matches serving prefill.
        ttfts = []
        from transformerengine_tpu.inference import prefill
        for i in range(5):
            tk = tokens.at[:, 1].set((tokens[:, 1] + 13 * i)
                                     % cfg.vocab_size)
            t0 = time.perf_counter()
            first, _ = prefill(model, variables, tk, ip, lengths, 0.0)
            int(first[0])
            ttfts.append(time.perf_counter() - t0)
        ttft_wall = sorted(ttfts)[len(ttfts) // 2]
        ttft_dev = None
        if on_tpu:
            # Device-lane TTFT: the wall number carries ~30 ms of axon
            # tunnel RTT + host fetch that production serving does not
            # pay; the device-busy time of one prefill is the honest
            # hardware TTFT.
            from benchmarks.xprof import profile

            def one_prefill():
                tk = tokens.at[:, 1].set((tokens[:, 1] + 77)
                                         % cfg.vocab_size)
                first, _ = prefill(model, variables, tk, ip, lengths, 0.0)
                return int(first[0])

            ttft_dev = profile(one_prefill,
                               logdir="/tmp/te_xprof_ttft")[1] / 1e6
        return per_step, ttft_wall, ttft_dev

    fp8_vars = prequantize_kernels(variables, te.Float8CurrentScaling())
    t_fp8, ttft_fp8, ttft_fp8_dev = bench_variant(fp8_vars, float8_e4m3)
    del fp8_vars  # free the fp8 weight copy before the bf16/nvfp4 runs
    # bf16 baseline with the same resident weight-layout prep as fp8
    # (recipe=None = transpose-once-at-load): otherwise XLA relayouts
    # each layer's weights with a full copy inside the decode scan
    # (~13.8 ms/step on this rung) and the fp8/bf16 ratio is fiction.
    bf16_vars = prequantize_kernels(variables, None)
    t_bf16, ttft_bf16, _ = bench_variant(bf16_vars, jnp.bfloat16)
    del bf16_vars
    out = {
        "decode_tokens_per_s": round(B / t_fp8, 1),
        "decode_fp8_vs_bf16": round(t_bf16 / t_fp8, 3),
        "ttft_p50_ms": round(ttft_fp8 * 1e3, 1),
        "ttft_p50_bf16_ms": round(ttft_bf16 * 1e3, 1),
    }
    if ttft_fp8_dev is not None:
        out["ttft_device_ms"] = round(ttft_fp8_dev * 1e3, 1)
    from benchmarks.ladder import sanity_check_ratio
    sanity_check_ratio(out, "decode_fp8_vs_bf16", 2.3,
                       "memory-bound decode on a <=2x fp8/bf16 byte diet")
    # Ladder #5 (single-chip slice): NVFP4-resident weights (RHT cast at
    # load via prequantize_kernels) + FP8 KV cache. The multi-host part
    # of the rung is covered by dryrun_multichip; this measures the
    # NVFP4 numerics/perf on the one real chip, same timing window as
    # the FP8/BF16 variants so the ratios survive tunnel drift.
    try:
        # donate: the bf16-resident block-decode default (r5) makes the
        # NVFP4 copy weight-sized; freeing the source kernels as they
        # convert keeps the 8B-geometry rung under 16 GB HBM. variables
        # has no users after this.
        nv_vars = prequantize_kernels(variables, te.NVFP4BlockScaling(),
                                      donate=True)
        t_nv, ttft_nv, _ = bench_variant(nv_vars, float8_e4m3)
        out["nvfp4_decode_tokens_per_s"] = round(B / t_nv, 1)
        out["nvfp4_vs_bf16"] = round(t_bf16 / t_nv, 3)
        out["nvfp4_ttft_p50_ms"] = round(ttft_nv * 1e3, 1)
        sanity_check_ratio(out, "nvfp4_vs_bf16", 4.6,
                           "memory-bound decode on a <=4x byte diet")
    except Exception as e:  # never let rung 5 sink the north star
        out["nvfp4_error"] = str(e)[:200]
    return out


ALL_RUNGS = ("decode", "linear", "ln_mlp", "flash", "mxfp8", "moe",
             "convergence")


def _run_rung(name):
    from benchmarks import ladder
    plan = {
        "decode": bench_decode_and_ttft,
        "linear": ladder.bench_linear,
        "ln_mlp": ladder.bench_ln_mlp,
        "flash": ladder.bench_flash_prefill,
        "mxfp8": ladder.bench_mxfp8_layer,
        "moe": ladder.bench_moe_mlp,
        "convergence": ladder.bench_convergence,
    }
    return plan[name]()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default=",".join(ALL_RUNGS),
                    help="comma list: " + ",".join(ALL_RUNGS))
    ap.add_argument("--child", action="store_true",
                    help="internal: run the single rung in-process")
    args = ap.parse_args()
    rungs = [r for r in args.rungs.split(",") if r]

    if args.child:
        # One rung, this process. Parent parses the last stdout line.
        print("RUNG_JSON " + json.dumps(_run_rung(rungs[0])), flush=True)
        return

    # Each rung runs in its own subprocess: device memory is released
    # between rungs, and one rung OOMing the chip (RESOURCE_EXHAUSTED
    # poisons the whole TPU client once it fires) cannot sink the rest
    # of the ladder. Sequential, so only ONE TPU process exists at a
    # time (axon tunnel requirement).
    import os
    import subprocess
    import sys

    def probe_tunnel(deadline_s=360):
        """Block until the TPU tunnel answers a tiny computation again.
        Killing a hung child mid-TPU-call wedges the axon tunnel for
        ~2-5 min (FAILED_PRECONDITION); launching the next rung into the
        wedged tunnel would cascade the failure down the whole ladder."""
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < deadline_s:
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp;"
                     "print(float(jnp.dot(jnp.ones((8,8)), jnp.ones((8,8)))"
                     ".sum()))"],
                    capture_output=True, text=True, timeout=240)
                if r.returncode == 0:
                    return True
            except subprocess.TimeoutExpired:
                # A killed mid-call probe re-wedges the tunnel for a few
                # minutes — back off before trying again.
                pass
            time.sleep(30)
        return False

    def run_rung_child(name):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", "--rungs", name],
            capture_output=True, text=True, timeout=900)
        line = next((l for l in reversed(proc.stdout.splitlines())
                     if l.startswith("RUNG_JSON ")), None)
        if proc.returncode == 0 and line:
            return json.loads(line[len("RUNG_JSON "):]), None
        tail = (proc.stderr or proc.stdout or "").strip()
        return None, tail[-400:] or f"exit={proc.returncode}"

    results, errors = {}, {}
    for name in ALL_RUNGS:
        if name not in rungs:
            continue
        # One retry per rung; after a timeout (child SIGKILLed mid-TPU
        # call) wait for the tunnel to recover before touching it again.
        for attempt in (0, 1):
            try:
                res, err = run_rung_child(name)
                if res is not None:
                    results[name] = res
                    errors.pop(name, None)
                    break
                errors[name] = err
            except subprocess.TimeoutExpired:
                errors[name] = "rung timed out (900s); child killed"
                probe_tunnel()
            except Exception as e:  # a rung failing must not kill the round
                errors[name] = "".join(
                    traceback.format_exception_only(type(e), e))[-400:].strip()

    decode = results.get("decode", {})
    out = {
        "metric": "fp8_decode_tokens_per_sec_per_chip_8b_geometry_16L",
        "value": decode.get("decode_tokens_per_s"),
        "unit": "tokens/s",
        "vs_baseline": decode.get("decode_fp8_vs_bf16"),
        "ladder": results,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
