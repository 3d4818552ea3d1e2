"""Graph capture API parity.

TPU counterpart of the reference's CUDA-graph machinery (reference:
pytorch/graph.py:1125 make_graphed_callables — capture, FP8-state
save/restore, warmup, microbatch interleave). On TPU, `jax.jit` IS the
capture: tracing happens once, the compiled program replays with new
inputs, and functional quantizer state removes the save/restore dance.
This module keeps the reference's API name so migrating callers have a
one-line change.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple, Union

import jax


def make_graphed_callables(
    callables: Union[Callable, Sequence[Callable]],
    sample_args: Union[Tuple, Sequence[Tuple]] = (),
    num_warmup_iters: int = 0,
    **_ignored,
):
    """jit-compile callables ahead of time (reference: graph.py:1125).

    ``sample_args`` triggers eager compilation (the analog of capture);
    warmup iterations are unnecessary under jit and ignored beyond the
    single compile.
    """
    single = callable(callables)
    fns = [callables] if single else list(callables)
    args_list = [sample_args] if single else list(sample_args)
    out = []
    for fn, args in zip(fns, args_list or [()] * len(fns)):
        jitted = jax.jit(fn)
        if args:
            jitted.lower(*args).compile()
        out.append(jitted)
    return out[0] if single else tuple(out)
