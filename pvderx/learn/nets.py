"""Policy/value networks for the RL learner.

Reference analog: the stable-baselines DQN/PPO nets used by the demo notebooks
(SURVEY.md §2.1 #13, L7). Here: a Flax actor-critic MLP sized for this obs
space; widths are MXU-friendly multiples of 128 by default so the learner's
matmuls tile cleanly (SURVEY.md §2.5 TP row: sharding of wider layers is
supported via the mesh but unnecessary at this size).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class ActorCritic(nn.Module):
    n_actions: int
    hidden: tuple = (128, 128)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        ortho = nn.initializers.orthogonal
        h = x.astype(self.dtype)
        for w in self.hidden:
            h = nn.tanh(nn.Dense(w, kernel_init=ortho(np.sqrt(2)), dtype=self.dtype)(h))
        logits = nn.Dense(self.n_actions, kernel_init=ortho(0.01), dtype=self.dtype)(h)
        value = nn.Dense(1, kernel_init=ortho(1.0), dtype=self.dtype)(h)
        return logits, jnp.squeeze(value, -1)


class QNetwork(nn.Module):
    """State-action value MLP for DQN (reference-demo parity: the upstream
    notebooks train stable-baselines DQN, SURVEY.md §2.1 #13)."""

    n_actions: int
    hidden: tuple = (128, 128)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        ortho = nn.initializers.orthogonal
        h = x.astype(self.dtype)
        for w in self.hidden:
            h = nn.relu(nn.Dense(w, kernel_init=ortho(np.sqrt(2)),
                                 dtype=self.dtype)(h))
        return nn.Dense(self.n_actions, kernel_init=ortho(1.0),
                        dtype=self.dtype)(h)


LOG_STD_MIN, LOG_STD_MAX = -5.0, 2.0


class TanhGaussianActor(nn.Module):
    """Squashed-Gaussian policy for the continuous action extension (SAC)."""

    act_dim: int
    hidden: tuple = (128, 128)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        ortho = nn.initializers.orthogonal
        h = x.astype(self.dtype)
        for w in self.hidden:
            h = nn.relu(nn.Dense(w, kernel_init=ortho(np.sqrt(2)),
                                 dtype=self.dtype)(h))
        mu = nn.Dense(self.act_dim, kernel_init=ortho(0.01), dtype=self.dtype)(h)
        log_std = nn.Dense(self.act_dim, kernel_init=ortho(0.01),
                           dtype=self.dtype)(h)
        return mu, jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)


class DoubleCritic(nn.Module):
    """Twin Q networks (clipped double-Q) on concatenated (obs, action)."""

    hidden: tuple = (128, 128)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, obs, act):
        ortho = nn.initializers.orthogonal
        x = jnp.concatenate([obs, act], axis=-1).astype(self.dtype)
        qs = []
        for _ in range(2):
            h = x
            for w in self.hidden:
                h = nn.relu(nn.Dense(w, kernel_init=ortho(np.sqrt(2)),
                                     dtype=self.dtype)(h))
            qs.append(jnp.squeeze(
                nn.Dense(1, kernel_init=ortho(1.0), dtype=self.dtype)(h), -1))
        return qs[0], qs[1]
