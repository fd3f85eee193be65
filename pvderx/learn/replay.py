"""Packed circular replay buffer — shared by the DQN and SAC learners.

One static-shape [capacity, row_dim] matrix plus circular ptr/size. Row
packing/unpacking stays with each learner (their transition layouts differ:
DQN carries a discrete action column riding as f32, SAC a continuous action
block); the buffer mechanics live here once. Design rationale (measured,
round 4): k narrow random-row gathers/scatters are index-latency-bound on
TPU — splitting the buffer into per-field arrays made the update phase 87%
of the DQN train step; one wide-row gather per sample and one wide scatter
per insert roughly doubled DQN and SAC end-to-end (PARITY.md learner table;
same lesson as the PPO minibatch shuffle in learn/ppo.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pvderx._pytree import pytree_dataclass


@pytree_dataclass
class Replay:
    """Circular replay as ONE packed matrix (see module docstring)."""

    data: jnp.ndarray   # [capacity, row_dim]
    ptr: jnp.ndarray    # int32
    size: jnp.ndarray   # int32


def make_replay(capacity: int, row_dim: int, dtype) -> Replay:
    return Replay(data=jnp.zeros((capacity, row_dim), dtype),
                  ptr=jnp.zeros((), jnp.int32),
                  size=jnp.zeros((), jnp.int32))


def insert_rows(rp: Replay, rows: jnp.ndarray) -> Replay:
    """Circular write of [n, row_dim] packed rows (ONE wide scatter).

    Capacity is the buffer's own leading dimension — no separate parameter
    to get out of sync with it (a mismatched value would silently drop
    scatters under JAX's out-of-bounds semantics). int32 index arithmetic
    throughout: an int64 scatter index into int32-indexed buffers warns
    (and will error) under strict promotion when x64 is on.
    """
    capacity = rp.data.shape[0]
    n = rows.shape[0]
    # n > capacity would put duplicate indices in one .at[idx].set, whose
    # write order JAX does not specify — the surviving rows would be
    # nondeterministic. Static shapes, so a plain trace-time assert suffices.
    assert n <= capacity, (
        f"insert_rows: {n} rows > capacity {capacity}; shrink "
        f"rollout_len*n_envs or grow the buffer")
    idx = (rp.ptr + jnp.arange(n, dtype=jnp.int32)) % capacity
    return Replay(data=rp.data.at[idx].set(rows),
                  ptr=(rp.ptr + n) % capacity,
                  size=jnp.minimum(rp.size + n, capacity))


def sample_rows(rp: Replay, key, batch_size: int) -> jnp.ndarray:
    """Uniform sample of [batch_size, row_dim] packed rows (ONE wide gather)."""
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(rp.size, 1), dtype=jnp.int32)
    return rp.data[idx]
