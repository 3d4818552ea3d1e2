"""Mesh resources and logical-axis sharding.

TPU-native distributed layer (reference: jax/sharding.py:79-444). All
parallelism in this framework is expressed as shardings over a single
`jax.sharding.Mesh`; XLA inserts the collectives. `MeshResource` names
which mesh axis serves each parallelism role, and the logical-axis table
maps module-level axis names onto mesh axes for Flax's
`with_logical_partitioning`.
"""
from __future__ import annotations

import contextlib
import dataclasses
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec


@dataclasses.dataclass(frozen=True)
class MeshResource:
    """Which mesh axis implements each parallelism strategy
    (reference: jax/sharding.py:320)."""

    dp_resource: Optional[str] = None     # data parallel (batch)
    tp_resource: Optional[str] = None     # tensor parallel (hidden)
    tpsp_resource: Optional[str] = None   # tensor + sequence parallel
    fsdp_resource: Optional[str] = None   # fully-sharded data parallel
    pp_resource: Optional[str] = None     # pipeline parallel
    cp_resource: Optional[str] = None     # context parallel (sequence)
    ep_resource: Optional[str] = None     # expert parallel


# ---------------------------------------------------------------------------
# Logical axis names (reference: jax/sharding.py:79-112)
# ---------------------------------------------------------------------------
BATCH_AXES = "nvte_batch"
SEQLEN_AXES = "nvte_seqlen"
SEQLEN_TP_AXES = "nvte_seqlen_tp"
SEQLEN_CP_AXES = "nvte_seqlen_cp"
HEAD_AXES = "nvte_head"
HIDDEN_AXES = "nvte_hidden"
HIDDEN_TP_AXES = "nvte_hidden_tp"
JOINED_AXES = "nvte_joined"
W_NO_SHARD_AXES = "nvte_w_no_shard"
W_FSDP_AXES = "nvte_w_fsdp"
W_TP_AXES = "nvte_w_tp"
W_JOINED_AXES = "nvte_w_joined"
EXPERT_AXES = "nvte_expert"


class _State(threading.local):
    def __init__(self):
        self.stack = [MeshResource()]


_state = _State()


def global_mesh_resource() -> MeshResource:
    return _state.stack[-1]


@contextlib.contextmanager
def global_shard_guard(resource: MeshResource):
    """Install a MeshResource for the scope (reference: jax/sharding.py:349)."""
    _state.stack.append(resource)
    try:
        yield
    finally:
        _state.stack.pop()


def generate_sharding_rules(resource: Optional[MeshResource] = None):
    """Logical-axis -> mesh-axis rules for flax.linen.logical_axis_rules."""
    r = resource or global_mesh_resource()
    batch = (r.dp_resource, r.fsdp_resource)
    batch = tuple(a for a in batch if a is not None) or None
    return (
        (BATCH_AXES, batch),
        (SEQLEN_AXES, None),
        (SEQLEN_TP_AXES, r.tpsp_resource),
        (SEQLEN_CP_AXES, r.cp_resource),
        (HEAD_AXES, r.tp_resource),
        (HIDDEN_AXES, None),
        (HIDDEN_TP_AXES, r.tp_resource),
        (JOINED_AXES, None),
        (W_NO_SHARD_AXES, None),
        (W_FSDP_AXES, r.fsdp_resource),
        (W_TP_AXES, r.tp_resource),
        (W_JOINED_AXES, None),
        (EXPERT_AXES, r.ep_resource),
    )


def extend_logical_axis_rules(rules, resource: Optional[MeshResource] = None):
    """Extend user Flax logical-axis rules with this package's rules
    (reference: jax/flax/transformer.py:63 extend_logical_axis_rules).
    User entries win on conflict; make sure the mesh resource is set
    (via autocast / global_shard_guard) before calling."""
    rules = tuple(rules)
    seen = {key for key, _ in rules}
    extra = tuple((k, v) for k, v in generate_sharding_rules(resource)
                  if k not in seen)
    return rules + extra


# ---------------------------------------------------------------------------
# Collective helpers for the quantization state machine
# ---------------------------------------------------------------------------

def all_reduce_max_along_all_axes_except_PP(x: jax.Array, mesh: Optional[Mesh] = None):
    """Max-allreduce an amax over every mesh axis except pipeline
    (reference: jax/sharding.py:444). Inside jit/shard_map contexts the
    mesh axes are visible; outside, this is a no-op on a single host.
    """
    r = global_mesh_resource()
    axes = [a for a in (r.dp_resource, r.tp_resource, r.tpsp_resource,
                        r.fsdp_resource, r.cp_resource, r.ep_resource)
            if a is not None]
    for a in axes:
        try:
            x = jax.lax.pmax(x, a)
        except NameError:
            pass
    return x


def with_sharding_constraint_by_logical_axes(x: jax.Array, logical_axes):
    """Apply a sharding constraint expressed in logical axis names
    (reference: jax/quantize/tensor.py:942 usage pattern). No-op when no
    mesh is active or axes are None."""
    if logical_axes is None:
        return x
    try:
        import flax.linen as nn
        return nn.with_logical_constraint(x, logical_axes)
    except Exception:
        return x


def lax_paral_op(x, mesh_axis):
    return x


def num_of_devices() -> int:
    return len(jax.devices())
