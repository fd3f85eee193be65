"""Pytree-registered frozen dataclasses.

All pvderx configuration/state containers are frozen dataclasses registered as
JAX pytrees so they can flow through jit/vmap/scan and be sharded with
NamedSharding. Fields named in ``meta`` are static (hashable, trace-time).
"""
from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta`` fields are auxiliary (static under jit); all others are leaves.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        names = [f.name for f in dataclasses.fields(c)]
        data = [n for n in names if n not in meta]
        jax.tree_util.register_dataclass(c, data_fields=data, meta_fields=list(meta))
        return c

    return wrap(cls) if cls is not None else wrap


def replace(obj, **kw):
    return dataclasses.replace(obj, **kw)
