"""Continuous batching: a host-side serving loop over the slot-reuse cache.

TPU analog of the reference's serving integration point (reference:
pytorch/attention/inference.py InferenceParams + KVCacheManager slot
reuse; the te_gemma tutorial drives it from HF generate). The device
programs are the same jitted prefill / one-step decode used everywhere
else — the scheduler only decides WHICH slot runs what:

* ``submit`` queues a request (token list).
* each ``step``: admit queued requests into free slots (a batch-1
  prefill scattered into the slot's cache rows), then run ONE decode
  step for the whole batch and harvest per-slot tokens on the host.
* a slot finishes on EOS or ``max_new_tokens`` and immediately frees.

Prompts are right-padded to a fixed ``prompt_len`` so admission never
recompiles; decode compiles once. Idle slots decode garbage rows that
nothing reads (batch rows are independent through every layer), and
their clamped cache writes stay in-bounds by XLA's dynamic-slice
semantics.

FP8 caches: KV scales are PER SLOT ((B,) lanes in the cache collection,
reference: inference.py:403 per-cache-manager recalibration), so each
admission calibrates the request's own prefill amax into its slot lane
— live neighbors are never rescaled. ``fixed_kv_scale`` still pins one
scale for all slots (offline-calibrated serving).
"""
from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from .engine import decode_steps, prefill
from .kv_cache import InferenceParams


@partial(jax.jit, donate_argnums=(0,))
def _scatter_slot(big_cache, small_cache, slot):
    """Write a batch-1 cache into row ``slot`` of the batch-B cache —
    including the slot's ``kv_scale`` lane (per-slot FP8 calibration)."""
    def fix(path, big, small):
        if (big.ndim >= 1 and small.ndim == big.ndim
                and small.shape[0] == 1 and big.shape[1:] == small.shape[1:]):
            return jax.lax.dynamic_update_slice_in_dim(
                big, small.astype(big.dtype), slot, axis=0)
        return big
    return jax.tree_util.tree_map_with_path(fix, big_cache, small_cache)


@jax.jit
def _reset_slot_length(cache, slot):
    def fix(path, leaf):
        if path[-1].key == "cache_length":
            return leaf.at[slot].set(0)
        return leaf
    return jax.tree_util.tree_map_with_path(fix, cache)


@dataclasses.dataclass
class _Request:
    rid: int
    tokens: List[int]


class ContinuousBatchingEngine:
    """Slot-based continuous batching (greedy decoding).

    >>> eng = ContinuousBatchingEngine(model, variables,
    ...     max_batch_size=4, max_sequence_length=256, prompt_len=64,
    ...     max_new_tokens=32, eos_id=2)
    >>> rid = eng.submit([1, 5, 7, 9])
    >>> outputs = eng.run()          # {rid: [tok, ...]}
    """

    def __init__(self, model, variables, *, max_batch_size: int,
                 max_sequence_length: int, prompt_len: int,
                 max_new_tokens: int, eos_id: Optional[int] = None,
                 kv_cache_dtype=jnp.bfloat16,
                 fixed_kv_scale: Optional[float] = None):
        self.model = model
        self.variables = {k: v for k, v in variables.items() if k != "cache"}
        self.B = max_batch_size
        self.prompt_len = prompt_len
        self.max_new = max_new_tokens
        self.eos_id = eos_id
        self.ip = InferenceParams(
            max_batch_size=max_batch_size,
            max_sequence_length=max_sequence_length,
            kv_cache_dtype=jnp.dtype(kv_cache_dtype),
            fixed_kv_scale=fixed_kv_scale)
        self.ip1 = dataclasses.replace(self.ip, max_batch_size=1)

        # B-sized cache skeleton from a dummy full-batch prefill, then
        # zeroed lengths so every slot starts empty.
        dummy = jnp.zeros((self.B, prompt_len), jnp.int32)
        _, cache = prefill(model, variables, dummy, self.ip,
                           jnp.ones((self.B,), jnp.int32))
        self.cache = _reset_slot_length(cache, jnp.arange(self.B))

        self.current = jnp.zeros((self.B,), jnp.int32)  # last token/slot
        self.queue: deque = deque()
        self.slot_req: List[Optional[_Request]] = [None] * self.B
        self.emitted: Dict[int, List[int]] = {}
        self._admission_done: Dict[int, List[int]] = {}
        self._next_rid = 0

    # ------------------------------------------------------------- API --
    def submit(self, tokens: List[int]) -> int:
        assert 0 < len(tokens) <= self.prompt_len, (
            f"prompt length {len(tokens)} exceeds the padded admission "
            f"width {self.prompt_len}")
        rid = self._next_rid
        self._next_rid += 1
        self.queue.append(_Request(rid, list(tokens)))
        return rid

    @property
    def active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def step(self) -> Dict[int, List[int]]:
        """Admit + one decode step. Returns requests FINISHED this step."""
        self._admit()
        done_now, self._admission_done = self._admission_done, {}
        if self.active == 0:
            return done_now
        toks, self.cache = decode_steps(
            self.model, self.variables, self.cache, self.current,
            self.ip, 1)
        self.current = toks[:, 0]
        host = jax.device_get(self.current)
        done: Dict[int, List[int]] = done_now
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            out = self.emitted[req.rid]
            out.append(int(host[slot]))
            hit_eos = self.eos_id is not None and out[-1] == self.eos_id
            if hit_eos or len(out) >= self.max_new:
                done[req.rid] = out
                self._free(slot)
        return done

    def run(self) -> Dict[int, List[int]]:
        """Drive steps until the queue and all slots drain."""
        results: Dict[int, List[int]] = {}
        while self.queue or self.active:
            results.update(self.step())
        return results

    # -------------------------------------------------------- internals --
    def _admit(self):
        for slot in range(self.B):
            if not self.queue or self.slot_req[slot] is not None:
                continue
            req = self.queue.popleft()
            pad = jnp.zeros((1, self.prompt_len), jnp.int32)
            tokens = pad.at[0, :len(req.tokens)].set(
                jnp.asarray(req.tokens, jnp.int32))
            first, cache1 = prefill(
                self.model, self.variables, tokens, self.ip1,
                jnp.asarray([len(req.tokens)], jnp.int32))
            self.cache = _scatter_slot(self.cache, cache1,
                                       jnp.asarray(slot, jnp.int32))
            self.current = self.current.at[slot].set(first[0])
            self.slot_req[slot] = req
            # The first token comes from prefill itself.
            self.emitted[req.rid] = [int(first[0])]
            if (self.eos_id is not None and self.emitted[req.rid][-1] ==
                    self.eos_id) or self.max_new <= 1:
                # degenerate: finished at admission
                self._admission_done[req.rid] = self.emitted[req.rid]
                self._free(slot)

    def _free(self, slot: int):
        self.slot_req[slot] = None
        self.cache = _reset_slot_length(self.cache,
                                        jnp.asarray(slot, jnp.int32))
