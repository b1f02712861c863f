"""Pytree checkpointing to a single .npz (self-contained; keeps the
reference's single-file ckpt ergonomics, runner.py:125-130).

A checkpoint is a nested pytree of arrays + python scalars.  Paths are
flattened to '/'-joined keys; list indices encoded as '#i'.  Loading
restores the exact nesting.  Scalars (epoch etc.) round-trip via 0-d arrays.
"""

from __future__ import annotations

import io
import os

import numpy as np
import jax
import jax.numpy as jnp


_LIST_TAG = "#"


def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            assert "/" not in str(k), k
            _flatten(v, f"{prefix}/{k}" if prefix else str(k), out)
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}/__len__"] = np.asarray(len(tree))
        out[f"{prefix}/__tuple__"] = np.asarray(isinstance(tree, tuple))
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/{_LIST_TAG}{i}", out)
    elif tree is None:
        out[f"{prefix}/__none__"] = np.asarray(True)
    else:
        out[prefix] = np.asarray(tree)


def save_checkpoint(path, tree):
    flat = {}
    _flatten(tree, "", flat)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_checkpoint(path):
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten(flat)


def _unflatten(flat):
    root = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return _rebuild(root)


def _rebuild(node):
    if not isinstance(node, dict):
        return node
    if "__none__" in node:
        return None
    if "__len__" in node:
        n = int(node["__len__"])
        items = [_rebuild(node[f"{_LIST_TAG}{i}"]) for i in range(n)]
        return tuple(items) if bool(node.get("__tuple__", False)) else items
    return {k: _rebuild(v) for k, v in node.items()}


def to_jax(tree):
    return jax.tree.map(lambda x: jnp.asarray(x), tree)
