"""Small pytree utilities."""
from __future__ import annotations

import dataclasses
from typing import Any

import jax


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class Static:
    """Wrap hashable static metadata (shapes, dtypes) so it can travel
    through custom_vjp residuals / pytree positions without being traced."""

    value: Any
