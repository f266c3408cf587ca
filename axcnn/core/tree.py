"""Small pytree utilities shared across the framework."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def tree_map_with_path(fn, tree):
    """Map ``fn(path_str, leaf)`` over a pytree; path is '/'-joined keys."""

    def _name(entry) -> str:
        if isinstance(entry, jax.tree_util.DictKey):
            return str(entry.key)
        if isinstance(entry, jax.tree_util.SequenceKey):
            return str(entry.idx)
        if isinstance(entry, jax.tree_util.GetAttrKey):
            return entry.name
        return str(entry)

    def _fn(path, leaf):
        return fn("/".join(_name(p) for p in path), leaf)

    return jax.tree_util.tree_map_with_path(_fn, tree)


def flatten_named(tree) -> dict:
    """Flatten a nested-dict pytree into {'a/b/c': leaf}."""
    out = {}

    def _walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            out[prefix] = node

    _walk("", tree)
    return out


def tree_cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )
