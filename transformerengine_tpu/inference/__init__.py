"""Inference: KV caches (FP8/paged), decode attention, generation engine
(reference: pytorch/attention/inference.py, te_gemma tutorial)."""
from .batching import ContinuousBatchingEngine
from .engine import decode_steps, generate, prefill
from .kv_cache import (
    InferenceParams, PagedKVState, cache_append, calibrate_kv_scale,
    paged_append_token, paged_gather_kv, paged_init, quantize_for_cache)
