"""Pytree dataclasses: the structural idiom of the framework.

Every kernel, prior, and model in this library is a frozen dataclass
registered as a JAX pytree.  Array-valued fields are pytree leaves (so the
whole object can be passed through ``jit``/``grad``/``vmap`` and optimised
directly with optax); fields named in ``static`` are hashable metadata that
participate in compilation caching instead.

This replaces the reference's ``torch.nn.Module`` + ``register_parameter``
pattern (e.g. /root/reference/models/nonstationary_models.py:31-38) with a
functional equivalent: parameters live *in* the object, trainability is
expressed as a boolean mask pytree (see ``trainable_mask``), and "freezing"
a parameter means masking its gradient rather than mutating a flag.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


def pytree_dataclass(cls=None, *, static: tuple = ()):
    """Decorator: make ``cls`` a frozen dataclass registered as a pytree.

    Fields listed in ``static`` become metadata (hashed for jit caching);
    all other fields are pytree children.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        fields = [f.name for f in dataclasses.fields(c)]
        meta = [f for f in fields if f in static]
        data = [f for f in fields if f not in static]
        jax.tree_util.register_dataclass(c, data_fields=data, meta_fields=meta)

        def _replace(self, **kw):
            return dataclasses.replace(self, **kw)

        c.replace = _replace
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def trainable_mask(tree: Any, predicate: Callable[[str], bool]) -> Any:
    """Boolean mask pytree: True where the leaf path satisfies ``predicate``.

    ``predicate`` receives a '/'-joined path string such as
    ``"kernel/raw_lengthscale"``.  Used to freeze parameters the way the
    reference does with ``requires_grad = False``
    (/root/reference/experiments/spatial_exp.py:166-167,179-186).
    """
    paths_leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    leaves = []
    for path, leaf in paths_leaves:
        name = "/".join(_key_str(k) for k in path)
        leaves.append(predicate(name))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(tree), leaves
    )


def _key_str(k) -> str:
    if hasattr(k, "name"):
        return str(k.name)
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def mask_grads(grads: Any, mask: Any) -> Any:
    """Zero out gradient leaves whose mask entry is False.

    Works with concrete bools and traced bool arrays alike (jnp.where), so
    the mask can be passed through jit as a pytree argument.
    """
    return jax.tree_util.tree_map(
        lambda g, m: jnp.where(m, g, jnp.zeros_like(g)), grads, mask
    )


def path_leaves(tree: Any):
    """[(path_string, leaf)] for observability/logging/param tables."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out.append(("/".join(_key_str(k) for k in path), leaf))
    return out
