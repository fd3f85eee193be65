"""Gymnasium single-env adapter + registration.

Reference analog: the `PVDER(gym.Env)` class and `register(id='PVDER-v0', ...)`
(SURVEY.md §2.1 #1-2, `[gym:gym_PVDER/__init__.py]`,
`[gym:gym_PVDER/envs/pv_der_env.py]` — unverified upstream paths). The adapter
wraps the pure-functional core for drop-in use with Gymnasium-based RL libs;
the batched TPU path lives in `pvderx.env.vector`.
"""
from __future__ import annotations

import numpy as np

try:
    import gymnasium as gym
    from gymnasium import spaces
    _HAS_GYM = True
except Exception:  # pragma: no cover - gymnasium is present in this image
    gym = None
    spaces = None
    _HAS_GYM = False

import jax
import jax.numpy as jnp

from pvderx.env import core

_BASE = gym.Env if _HAS_GYM else object


class PVDEREnv(_BASE):
    """Single PV-DER environment with the SPEC.md §9 contract.

    action: Discrete(5) — hold / Q± / Vdc± (reference-style), or
    Box(-1, 1, (2,)) when built with `continuous=True` (pvderx extension);
    observation: Box(13,).
    """

    metadata = {"render_modes": ["ansi"]}

    def __init__(self, preset: str = "10", seed: int = 0, render_mode=None,
                 cfg: core.EnvConfig | None = None, **cfg_kw):
        self.cfg = cfg if cfg is not None else core.make_env_config(preset, **cfg_kw)
        self._reset_fn = jax.jit(lambda k: core.reset(self.cfg, k))
        self._step_fn = jax.jit(lambda s, a: core.step(self.cfg, s, a))
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._last = None
        self.render_mode = render_mode
        if _HAS_GYM:
            if self.cfg.continuous:
                self.action_space = spaces.Box(
                    low=-1.0, high=1.0, shape=(core.ACT_DIM_CONT,),
                    dtype=np.float32)
            elif self.cfg.anomaly_detect:
                self.action_space = spaces.Discrete(core.N_ACTIONS_ANOM)
            else:
                self.action_space = spaces.Discrete(core.N_ACTIONS)
            self.observation_space = spaces.Box(
                low=-np.inf, high=np.inf, shape=(core.OBS_DIM,), dtype=np.float32)

    def reset(self, *, seed=None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset_fn(k)
        self._last = None
        return np.asarray(obs, np.float32), {}

    def step(self, action):
        if self.cfg.continuous:
            a = jnp.asarray(np.asarray(action, np.float32))
        else:
            a = jnp.asarray(int(action), jnp.int32)
        self._state, obs, reward, done, info = self._step_fn(self._state, a)
        info_np = {k: np.asarray(v) for k, v in info.items()}
        terminated = bool(info_np.pop("terminated"))
        truncated = bool(info_np.pop("truncated"))
        self._last = info_np
        return (np.asarray(obs, np.float32), float(reward),
                terminated, truncated, info_np)

    def render(self):
        if self._last is None:
            return "PVDER(t=0)"
        i = self._last
        return (f"t={int(self._state.t_step)} Vdc={float(i['vdc']):.4f} "
                f"|V|={float(i['v_mag']):.3f} P={float(i['p_pcc']):.3f} "
                f"Q={float(i['q_pcc']):.3f} f={float(i['f_meas']) * 60:.2f}Hz "
                f"tripped={bool(i['tripped'] > 0.5)}")


def register_envs():
    """Register `pvderx/PVDER-v0` with Gymnasium (reference: `PVDER-v0`)."""
    if not _HAS_GYM:
        return
    from gymnasium.envs.registration import register, registry
    if "pvderx/PVDER-v0" not in registry:
        register(id="pvderx/PVDER-v0", entry_point="pvderx.env.gym_adapter:PVDEREnv")


if _HAS_GYM:
    register_envs()
