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
