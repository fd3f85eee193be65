"""Checkpoint / resume of the full training pytree.

Reference analog: **none** (SURVEY.md §5 — reference episodes last seconds and
nothing persists). pvderx checkpoints the entire `PPORunner` pytree (env batch
state incl. RNG keys, learner params/optimizer, counters) with orbax; because
env state is a pure pytree, resume is bitwise-exact (tested). Multi-host runs
get per-host sharded checkpoints from orbax automatically.
"""
from __future__ import annotations

import os

import jax


def save(path: str, tree, step: int | None = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        ckptr.save(path, tree, force=True)
    return path


def restore(path: str, target):
    """Restore into the structure/shardings of `target` (an abstract or
    concrete example pytree)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        return ckptr.restore(path, target)
