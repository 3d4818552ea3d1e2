"""Checkpoint / resume of training state including quantizer metadata.

TPU counterpart of the reference's checkpointing contract (reference:
pytorch/module/base.py:1237 get_extra_state / :1298 set_extra_state —
FP8 scales + amax history serialized with the module;
tensor/float8_tensor.py:1006 __reduce_ex__ for lossless FP8 weight
checkpoints). Here everything is a pytree, so the whole train state —
params, optimizer state, and the quantize_meta collection (delayed
scaling scales + amax histories) — round-trips through orbax with no
special casing; fp8 leaves are saved as their raw payload dtype.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, *, force: bool = True) -> str:
    """Save a pytree train state with orbax (async-safe, multi-host)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, state, force=force)
    return path


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore; pass ``template`` (matching pytree of ShapeDtypeStruct or
    arrays) to get sharding/dtype-faithful restoration."""
    import orbax.checkpoint as ocp
    ckpt = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckpt.restore(path, item=template)
    return ckpt.restore(path)


def state_with_quantize_meta(params, quantize_meta=None, opt_state=None,
                             step=0):
    """Canonical train-state layout: keeps the recipe state next to the
    params so bitwise resume of DelayedScaling works (the reference's
    reduce_amax=False all-rank checkpoint caveat,
    common/recipe/__init__.py:214, applies the same way: shard the
    quantize_meta identically on save and restore)."""
    state = {"params": params, "step": step}
    if quantize_meta is not None:
        state["quantize_meta"] = quantize_meta
    if opt_state is not None:
        state["opt_state"] = opt_state
    return state
