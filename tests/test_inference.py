"""Inference: decode-attention kernel, KV cache managers, generation
(reference analog: tests/pytorch/test_kv_cache.py + te_gemma tutorial
equivalence of cached vs uncached generation)."""
import jax
import jax.numpy as jnp
import pytest

from transformerengine_tpu.attention import (
    AttnBackend, AttnMaskType, SequenceDescriptor, fused_attn)
from transformerengine_tpu.inference import (
    InferenceParams, cache_append, calibrate_kv_scale, generate,
    paged_append_token, paged_gather_kv, paged_init)
from transformerengine_tpu.models.llama import LLAMA_TINY, LlamaModel
from transformerengine_tpu.ops.decode_attention import decode_attention
from transformerengine_tpu.quantize.dtypes import float8_e4m3


class TestDecodeAttention:
    def test_matches_full_attention(self):
        b, smax, hq, hkv, d = 2, 128, 4, 2, 64
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, 1, hq, d), jnp.float32)
        kc = jax.random.normal(ks[1], (b, smax, hkv, d), jnp.float32)
        vc = jax.random.normal(ks[2], (b, smax, hkv, d), jnp.float32)
        lengths = jnp.array([100, 37], jnp.int32)
        out = decode_attention(q, kc, vc, lengths)
        ref = fused_attn(
            (q, kc, vc),
            sequence_descriptor=SequenceDescriptor.from_seqlens(
                jnp.ones((b,), jnp.int32), lengths),
            attn_mask_type=AttnMaskType.PADDING,
            backend=AttnBackend.UNFUSED)
        assert jnp.max(jnp.abs(out - ref)) < 2e-5

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_softmax_sink_matches_unfused(self, backend):
        """Sink softmax in decode (both backends) vs the unfused sink
        reference (reference: fused_attn.h NVTE_Softmax_Type; serving
        GPT-OSS-style sink-attention models from the KV cache)."""
        from transformerengine_tpu.attention import SoftmaxType
        b, smax, hq, hkv, d = 2, 128, 4, 2, 64
        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        q = jax.random.normal(ks[0], (b, 1, hq, d), jnp.float32)
        kc = jax.random.normal(ks[1], (b, smax, hkv, d), jnp.float32)
        vc = jax.random.normal(ks[2], (b, smax, hkv, d), jnp.float32)
        sink = jax.random.normal(ks[3], (hq,), jnp.float32)
        lengths = jnp.array([100, 37], jnp.int32)
        out = decode_attention(q, kc, vc, lengths, softmax_sink=sink,
                               backend=backend)
        ref = fused_attn(
            (q, kc, vc),
            sequence_descriptor=SequenceDescriptor.from_seqlens(
                jnp.ones((b,), jnp.int32), lengths),
            attn_mask_type=AttnMaskType.PADDING,
            softmax_type=SoftmaxType.LEARNABLE,
            softmax_offset=sink,
            backend=AttnBackend.UNFUSED)
        assert jnp.max(jnp.abs(out - ref)) < 2e-5

    def test_fp8_cache_close(self):
        b, smax, hq, hkv, d = 1, 64, 2, 2, 64
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(ks[0], (b, 1, hq, d), jnp.float32)
        k = jax.random.normal(ks[1], (b, smax, hkv, d), jnp.float32)
        v = jax.random.normal(ks[2], (b, smax, hkv, d), jnp.float32)
        lengths = jnp.full((b,), smax, jnp.int32)
        scale = calibrate_kv_scale(k, v)
        ck = jnp.zeros((b, smax, hkv, d), float8_e4m3)
        cv = jnp.zeros_like(ck)
        ck, cv, _ = cache_append(ck, cv, jnp.zeros((b,), jnp.int32), k, v,
                                 scale)
        out8 = decode_attention(q, ck, cv, lengths, kv_scale=1.0 / scale)
        ref = decode_attention(q, k, v, lengths)
        assert jnp.max(jnp.abs(out8 - ref)) < 0.05

    def test_sliding_window(self):
        b, smax, h, d = 1, 128, 2, 64
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(ks[0], (b, 1, h, d), jnp.float32)
        kc = jax.random.normal(ks[1], (b, smax, h, d), jnp.float32)
        vc = jax.random.normal(ks[2], (b, smax, h, d), jnp.float32)
        lengths = jnp.array([100], jnp.int32)
        out = decode_attention(q, kc, vc, lengths, window_left=16)
        # reference: only the last 17 positions are visible
        mask = jnp.zeros((b, 1, 1, smax), jnp.bool_).at[:, :, :, 83:100].set(True)
        ref = fused_attn((q, kc, vc), mask=mask, backend=AttnBackend.UNFUSED)
        assert jnp.max(jnp.abs(out - ref)) < 2e-5


class TestPagedCache:
    def test_append_and_gather_roundtrip(self):
        b, hkv, d, page = 2, 2, 16, 8
        state = paged_init(num_pages=16, page_size=page, batch=b,
                           max_pages_per_seq=4, hkv=hkv, d=d,
                           dtype=jnp.float32)
        toks = jax.random.normal(jax.random.PRNGKey(0), (12, b, 1, hkv, d))
        for t in range(12):
            state = paged_append_token(state, toks[t], toks[t])
        k_full, _ = paged_gather_kv(state)
        for t in range(12):
            assert jnp.allclose(k_full[:, t], toks[t][:, 0]), t
        assert int(state.free_head) == 4  # 2 seqs x ceil(12/8) pages


class TestGenerate:
    def test_cached_matches_uncached_greedy(self):
        model = LlamaModel(config=LLAMA_TINY)
        b, sp = 2, 16
        tokens = jax.random.randint(jax.random.PRNGKey(0), (b, sp), 1, 256)
        lengths = jnp.array([16, 11], jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), tokens)
        n_new = 6

        got = generate(model, variables, tokens, lengths, n_new)

        # Uncached greedy reference: full forward each step.
        seqs = [tokens[i, :lengths[i]] for i in range(b)]
        for i in range(b):
            for _ in range(n_new):
                logits = model.apply(variables, seqs[i][None])
                nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
                seqs[i] = jnp.concatenate([seqs[i], nxt[None]])
        for i in range(b):
            ref_new = seqs[i][int(lengths[i]):]
            assert jnp.array_equal(got[i], ref_new), (i, got[i], ref_new)

    def test_paged_matches_nonpaged_greedy(self):
        """Flax-MHA paged-cache collection path (reference:
        PagedKVCacheManager): same greedy tokens as the dense cache."""
        model = LlamaModel(config=LLAMA_TINY)
        b, sp = 2, 16
        tokens = jax.random.randint(jax.random.PRNGKey(0), (b, sp), 1, 256)
        lengths = jnp.array([16, 11], jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), tokens)
        n_new = 6
        ref = generate(model, variables, tokens, lengths, n_new)
        ip = InferenceParams(max_batch_size=b,
                             max_sequence_length=sp + n_new,
                             is_paged=True, page_size=8)
        got = generate(model, variables, tokens, lengths, n_new,
                       inference_params=ip)
        assert jnp.array_equal(got, ref), (got, ref)

    def test_paged_fp8_generation_runs(self):
        model = LlamaModel(config=LLAMA_TINY)
        b, sp = 2, 8
        tokens = jax.random.randint(jax.random.PRNGKey(0), (b, sp), 1, 256)
        lengths = jnp.full((b,), sp, jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), tokens)
        ip = InferenceParams(max_batch_size=b, max_sequence_length=16,
                             kv_cache_dtype=jnp.dtype(float8_e4m3),
                             is_paged=True, page_size=8)
        out = generate(model, variables, tokens, lengths, 4,
                       inference_params=ip)
        assert out.shape == (b, 4)
        assert jnp.all((out >= 0) & (out < 256))

    def test_fp8_cache_generation_runs(self):
        model = LlamaModel(config=LLAMA_TINY)
        b, sp = 1, 8
        tokens = jax.random.randint(jax.random.PRNGKey(0), (b, sp), 1, 256)
        lengths = jnp.full((b,), sp, jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), tokens)
        out = generate(model, variables, tokens, lengths, 4,
                       kv_cache_dtype=float8_e4m3)
        assert out.shape == (b, 4)
        assert jnp.all((out >= 0) & (out < 256))


class TestPagedDecodeAttention:
    def test_matches_contiguous_decode(self):
        from transformerengine_tpu.ops.paged_attention import (
            paged_decode_attention)
        b, hkv, hq, d, page = 2, 2, 4, 64, 16
        state = paged_init(num_pages=32, page_size=page, batch=b,
                           max_pages_per_seq=4, hkv=hkv, d=d,
                           dtype=jnp.float32)
        ks = jax.random.split(jax.random.PRNGKey(0), 40)
        toks = []
        for t in range(40):
            kv = jax.random.normal(ks[t], (b, 1, hkv, d))
            state = paged_append_token(state, kv, kv)
            toks.append(kv)
        q = jax.random.normal(jax.random.PRNGKey(99), (b, 1, hq, d))
        out = paged_decode_attention(q, state.pages_k, state.pages_v,
                                     state.page_table, state.lengths)
        kc = jnp.concatenate(toks, axis=1)
        ref = decode_attention(q, kc, kc, state.lengths)
        assert jnp.max(jnp.abs(out - ref)) < 2e-5

    def test_paged_softmax_sink_matches_contiguous(self):
        from transformerengine_tpu.attention import SoftmaxType
        from transformerengine_tpu.inference.kv_cache import (
            PagedKVState, paged_append_prompt)
        from transformerengine_tpu.ops.paged_attention import (
            paged_decode_attention)
        b, s, hkv, hq, d, page = 2, 64, 2, 4, 64, 16
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        q = jax.random.normal(ks[0], (b, 1, hq, d), jnp.float32)
        kc = jax.random.normal(ks[1], (b, s, hkv, d), jnp.float32)
        vc = jax.random.normal(ks[2], (b, s, hkv, d), jnp.float32)
        sink = jax.random.normal(ks[3], (hq,), jnp.float32)
        mpps = s // page
        state = PagedKVState(
            pages_k=jnp.zeros((b * mpps, page, hkv, d)),
            pages_v=jnp.zeros((b * mpps, page, hkv, d)),
            page_table=jnp.full((b, mpps), -1, jnp.int32),
            lengths=jnp.zeros((b,), jnp.int32),
            free_head=jnp.zeros((), jnp.int32))
        state = paged_append_prompt(state, kc, vc, None)
        out = paged_decode_attention(
            q, state.pages_k, state.pages_v, state.page_table,
            state.lengths, softmax_sink=sink)
        ref = decode_attention(q, kc, vc, state.lengths,
                               softmax_sink=sink)
        assert float(jnp.max(jnp.abs(out - ref))) < 2e-5

    def test_fp8_pages(self):
        from transformerengine_tpu.inference import calibrate_kv_scale
        from transformerengine_tpu.ops.paged_attention import (
            paged_decode_attention)
        b, h, d, page = 1, 2, 64, 8
        kv = jax.random.normal(jax.random.PRNGKey(0), (b, 1, h, d))
        scale = calibrate_kv_scale(kv, kv)
        state = paged_init(num_pages=8, page_size=page, batch=b,
                           max_pages_per_seq=2, hkv=h, d=d,
                           dtype=float8_e4m3)
        for _ in range(10):
            state = paged_append_token(state, kv, kv, scale)
        q = jax.random.normal(jax.random.PRNGKey(1), (b, 1, h, d))
        out = paged_decode_attention(
            q, state.pages_k, state.pages_v, state.page_table, state.lengths,
            kv_scale=1.0 / scale)
        ref = decode_attention(q, jnp.repeat(kv, 10, 1), jnp.repeat(kv, 10, 1),
                               jnp.array([10]))
        # fp8 cache vs exact bf16 reference: e4m3 payload noise
        assert jnp.max(jnp.abs(out - ref)) < 0.12


def _sample_compat(logits, key, temperature, top_k=0, top_p=1.0):
    from transformerengine_tpu.inference.engine import _sample, _sample_mode
    mode = _sample_mode(temperature, top_k, top_p)
    sampling = (jnp.float32(temperature), jnp.int32(top_k), jnp.float32(top_p))
    return _sample(logits, key, sampling, mode)


class TestSampling:
    def test_topk_restricts_support(self):
        logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
        keys = jax.random.split(jax.random.PRNGKey(0), 200)
        toks = jnp.stack([_sample_compat(logits, k, 1.0, top_k=2)[0]
                          for k in keys[:50]])
        assert jnp.all(toks < 2)

    def test_topp_restricts_support(self):
        logits = jnp.log(jnp.array([[0.6, 0.3, 0.07, 0.03]]))
        keys = jax.random.split(jax.random.PRNGKey(1), 50)
        toks = jnp.stack([_sample_compat(logits, k, 1.0, top_p=0.85)[0]
                          for k in keys])
        assert jnp.all(toks < 2)   # nucleus {0.6, 0.3}

    def test_sampling_params_do_not_recompile(self):
        """temperature/top_k/top_p are traced: changing values must reuse
        the compiled program (VERDICT r1: static sampling params)."""
        from transformerengine_tpu.inference.engine import (
            _decode_steps_jit, _prefill_jit)
        model = LlamaModel(config=LLAMA_TINY)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 1, 256)
        variables = model.init(jax.random.PRNGKey(1), tokens)
        before = _prefill_jit._cache_size() + _decode_steps_jit._cache_size()
        for t, k, p in ((0.8, 40, 0.95), (0.9, 50, 0.9), (1.3, 7, 0.5)):
            generate(model, variables, tokens, jnp.full((1,), 8, jnp.int32),
                     4, temperature=t, top_k=k, top_p=p)
        after = _prefill_jit._cache_size() + _decode_steps_jit._cache_size()
        assert after - before <= 2, (before, after)  # one entry per fn

    def test_generate_with_sampling_runs(self):
        model = LlamaModel(config=LLAMA_TINY)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 1, 256)
        out = generate(model, model.init(jax.random.PRNGKey(1), tokens),
                       tokens, jnp.full((1,), 8, jnp.int32), 4,
                       temperature=0.8, top_k=40, top_p=0.95)
        assert out.shape == (1, 4)


class TestContinuousBatching:
    """Slot-based continuous batching scheduler (reference serving
    integration point: InferenceParams slot reuse, te_gemma tutorial).
    More requests than slots; every request's output must equal the
    standalone whole-batch generate() of the same prompt."""

    def test_outputs_match_generate(self):
        from transformerengine_tpu.inference import (
            ContinuousBatchingEngine, generate)
        model = LlamaModel(config=LLAMA_TINY)
        P, NEW, B = 16, 6, 2
        key = jax.random.PRNGKey(0)
        variables = model.init(key, jnp.zeros((1, P), jnp.int32))
        prompts = [
            list(range(3, 3 + P)),
            list(range(5, 5 + 10)),         # shorter than P
            list(range(2, 2 + P)),
            list(range(11, 11 + 7)),
        ]
        eng = ContinuousBatchingEngine(
            model, variables, max_batch_size=B,
            max_sequence_length=P + NEW + 8, prompt_len=P,
            max_new_tokens=NEW, kv_cache_dtype=jnp.float32)
        rids = [eng.submit(p) for p in prompts]
        out = eng.run()
        assert sorted(out) == sorted(rids)

        for rid, prompt in zip(rids, prompts):
            toks = jnp.zeros((1, P), jnp.int32).at[0, :len(prompt)].set(
                jnp.asarray(prompt, jnp.int32))
            ref = generate(model, variables, toks,
                           jnp.asarray([len(prompt)], jnp.int32), NEW,
                           kv_cache_dtype=jnp.float32)
            assert out[rid] == [int(t) for t in ref[0]], (rid, out[rid])

    def test_fp8_fixed_scale_matches_generate(self):
        """FP8 KV caches work under continuous batching when the
        per-layer dequant scale is pinned (fixed_kv_scale) so slot
        admission never rescales live payloads."""
        from transformerengine_tpu.inference import (
            ContinuousBatchingEngine, InferenceParams, generate)
        model = LlamaModel(config=LLAMA_TINY)
        P, NEW, SCALE = 16, 4, 0.08
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, P), jnp.int32))
        prompts = [list(range(3, 3 + P)), list(range(7, 7 + 10))]
        eng = ContinuousBatchingEngine(
            model, variables, max_batch_size=2,
            max_sequence_length=P + NEW + 8, prompt_len=P,
            max_new_tokens=NEW, kv_cache_dtype=float8_e4m3,
            fixed_kv_scale=SCALE)
        rids = [eng.submit(p) for p in prompts]
        out = eng.run()
        for rid, prompt in zip(rids, prompts):
            toks = jnp.zeros((1, P), jnp.int32).at[0, :len(prompt)].set(
                jnp.asarray(prompt, jnp.int32))
            ip = InferenceParams(
                max_batch_size=1, max_sequence_length=P + NEW + 8,
                kv_cache_dtype=jnp.dtype(float8_e4m3),
                fixed_kv_scale=SCALE)
            ref = generate(model, variables, toks,
                           jnp.asarray([len(prompt)], jnp.int32), NEW,
                           inference_params=ip)
            assert out[rid] == [int(t) for t in ref[0]], (rid, out[rid])

    def test_fp8_auto_calibration_matches_generate(self):
        """Per-slot FP8 KV calibration: each admission calibrates its
        own prefill amax into its slot's scale lane — outputs must
        equal the whole-batch generate() (which uses the same per-row
        scales) exactly (reference: inference.py:403 per-cache-manager
        recalibration)."""
        from transformerengine_tpu.inference import (
            ContinuousBatchingEngine, generate)
        model = LlamaModel(config=LLAMA_TINY)
        P, NEW, B = 16, 5, 2
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, P), jnp.int32))
        prompts = [list(range(3, 3 + P)), list(range(40, 40 + 9)),
                   list(range(101, 101 + P))]
        eng = ContinuousBatchingEngine(
            model, variables, max_batch_size=B,
            max_sequence_length=P + NEW + 8, prompt_len=P,
            max_new_tokens=NEW, kv_cache_dtype=float8_e4m3)
        rids = [eng.submit(p) for p in prompts]
        out = eng.run()
        for rid, prompt in zip(rids, prompts):
            toks = jnp.zeros((1, P), jnp.int32).at[0, :len(prompt)].set(
                jnp.asarray(prompt, jnp.int32))
            ref = generate(model, variables, toks,
                           jnp.asarray([len(prompt)], jnp.int32), NEW,
                           kv_cache_dtype=float8_e4m3)
            assert out[rid] == [int(t) for t in ref[0]], (rid, out[rid])


class TestTPShardedDecode:
    """Tensor-parallel generation: variables sharded over a tp mesh axis
    via the logical-axis rules, KV cache sharded over kv heads by GSPMD
    propagation. Greedy outputs must match the single-device run
    (reference integration shape: pytorch/attention/inference.py:55 +
    transformer.py:591 tp_group plumbing — here the mesh + logical
    rules replace the process groups)."""

    def _sharded_generate(self, recipe=None, kv_dtype=jnp.bfloat16,
                          tp=4, new=6):
        from flax import linen as nn
        from jax.experimental import mesh_utils
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from transformerengine_tpu.parallel.sharding import (
            MeshResource, generate_sharding_rules, global_shard_guard)
        from transformerengine_tpu.quantize.prequant import (
            prequantize_kernels)

        model = LlamaModel(config=LLAMA_TINY)
        B, PROMPT = 2, 16
        tokens = jax.random.randint(jax.random.PRNGKey(0), (B, PROMPT),
                                    1, 200)
        lengths = jnp.array([PROMPT, PROMPT - 5], jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), tokens)
        if recipe is not None or kv_dtype != jnp.bfloat16:
            variables = prequantize_kernels(variables, recipe)
        ref = generate(model, variables, tokens, lengths, new,
                       kv_cache_dtype=kv_dtype)

        mesh = Mesh(mesh_utils.create_device_mesh(
            (tp,), jax.devices()[:tp]), ("tp",))
        resource = MeshResource(tp_resource="tp")
        rules = generate_sharding_rules(resource)
        with mesh, nn.logical_axis_rules(rules), \
                global_shard_guard(resource):
            abstract = jax.eval_shape(model.init, jax.random.PRNGKey(1),
                                      tokens)
            specs = nn.get_partition_spec(abstract)
            shardings = nn.logical_to_mesh_sharding(specs, mesh, rules)
            svars = jax.jit(model.init, out_shardings=shardings)(
                jax.random.PRNGKey(1), tokens)
            if recipe is not None or kv_dtype != jnp.bfloat16:
                svars = prequantize_kernels(svars, recipe)
            tok_sharded = jax.device_put(
                tokens, NamedSharding(mesh, P()))
            out = generate(model, svars, tok_sharded, lengths, new,
                           kv_cache_dtype=kv_dtype)
            out.block_until_ready()
        return ref, out

    def test_bf16_tp_greedy_matches_single_device(self):
        ref, out = self._sharded_generate()
        assert jnp.array_equal(ref, out), (ref, out)

    def test_fp8_resident_tp_generation_matches(self):
        import transformerengine_tpu as te
        ref, out = self._sharded_generate(
            recipe=te.Float8CurrentScaling(), kv_dtype=float8_e4m3)
        # fp8 payload collectives reorder f32 accumulations; near-ties
        # may flip on a random tiny model.
        assert (ref == out).mean() > 0.7, (ref, out)

    def test_continuous_batching_under_tp_mesh(self):
        """The slot-admission engine works unchanged over a tp-sharded
        model: batch-1 prefill scatter + shared decode step compile
        under GSPMD, outputs equal the single-device engine's."""
        from flax import linen as nn
        from jax.experimental import mesh_utils
        from jax.sharding import Mesh
        from transformerengine_tpu.inference import ContinuousBatchingEngine
        from transformerengine_tpu.parallel.sharding import (
            MeshResource, generate_sharding_rules, global_shard_guard)

        model = LlamaModel(config=LLAMA_TINY)
        P, NEW, B = 16, 4, 2
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, P), jnp.int32))
        prompts = [list(range(3, 3 + P)), list(range(40, 40 + 9)),
                   list(range(101, 101 + 12))]
        eng = ContinuousBatchingEngine(
            model, variables, max_batch_size=B,
            max_sequence_length=P + NEW + 8, prompt_len=P,
            max_new_tokens=NEW, kv_cache_dtype=jnp.float32)
        rids = [eng.submit(p) for p in prompts]
        ref = eng.run()

        mesh = Mesh(mesh_utils.create_device_mesh(
            (4,), jax.devices()[:4]), ("tp",))
        resource = MeshResource(tp_resource="tp")
        rules = generate_sharding_rules(resource)
        with mesh, nn.logical_axis_rules(rules), \
                global_shard_guard(resource):
            abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                      jnp.zeros((1, P), jnp.int32))
            sh = nn.logical_to_mesh_sharding(
                nn.get_partition_spec(abstract), mesh, rules)
            svars = jax.jit(model.init, out_shardings=sh)(
                jax.random.PRNGKey(0), jnp.zeros((1, P), jnp.int32))
            eng2 = ContinuousBatchingEngine(
                model, svars, max_batch_size=B,
                max_sequence_length=P + NEW + 8, prompt_len=P,
                max_new_tokens=NEW, kv_cache_dtype=jnp.float32)
            rids2 = [eng2.submit(p) for p in prompts]
            out = eng2.run()
        # f32 cache + f32 math: sharded collectives reorder sums, so
        # allow rare near-tie flips.
        agree = sum(out[r2] == ref[r1]
                    for r1, r2 in zip(rids, rids2))
        assert agree >= 2, (ref, out)
