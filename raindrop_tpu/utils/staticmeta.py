"""Hashable static metadata container for model param pytrees.

Hyperparameter ints stored as plain dict values inside a params pytree get
traced under jit (becoming tracers that can't size jnp.zeros or drive
Python control flow). `Meta` is registered as a static pytree node: it has
no leaves, so jit treats its contents as compile-time constants while it
still travels inside the params dict through optimizers and checkpoints.
"""

from __future__ import annotations

import jax


@jax.tree_util.register_static
class Meta:
    """Immutable mapping treated as a static (leafless) pytree node."""

    def __init__(self, **kwargs):
        self._items = tuple(sorted(kwargs.items()))

    def __getitem__(self, key):
        return dict(self._items)[key]

    def get(self, key, default=None):
        return dict(self._items).get(key, default)

    def __hash__(self):
        return hash(self._items)

    def __eq__(self, other):
        return isinstance(other, Meta) and self._items == other._items

    def __repr__(self):
        return f"Meta({dict(self._items)!r})"
