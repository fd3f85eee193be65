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
_VBASE = gym.vector.VectorEnv if _HAS_GYM else object


class PVDEREnv(_BASE):
    """Single PV-DER environment with the SPEC.md §9 contract.

    action: Discrete(5) — hold / Q± / Vdc± (reference-style), or
    Box(-1, 1, (2,)) when built with `continuous=True` (pvderx extension);
    observation: Box(13,).
    """

    metadata = {"render_modes": ["ansi"]}

    def __init__(self, preset: str = "10", seed: int = 0, render_mode=None,
                 cfg: core.EnvConfig | None = None, strict_init: bool = False,
                 init_res_tol: float | None = None, **cfg_kw):
        self.cfg = cfg if cfg is not None else core.make_env_config(preset, **cfg_kw)
        self.strict_init = bool(strict_init)
        if init_res_tol is None:
            # dtype-aware default: the Newton residual of a HEALTHY f32 init
            # sits in the 2e-5..4e-4 roundoff band (the f64 band is <1e-8 —
            # see tests/test_checks.py::test_reset_residual_f32_band), so a
            # single f64-grade tolerance would reject every healthy f32 reset
            init_res_tol = (1e-6 if self.cfg.der.rf.dtype == jnp.float64
                            else 1e-3)
        self.init_res_tol = float(init_res_tol)
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
        # Gymnasium contract: seed the inherited np_random too (the env's own
        # randomness is the JAX PRNG key, but `check_env` and seed-forwarding
        # wrappers expect `super().reset(seed=...)` semantics).
        if _HAS_GYM:
            super().reset(seed=seed, options=options)
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset_fn(k)
        self._last = None
        # init sanity (SURVEY §2.1 #9): surface the Newton residual of the
        # episode's steady-state init; strict mode rejects a failed solve
        # (e.g. aggressive zg_jitter + deep-sag randomization) instead of
        # silently starting the episode from garbage.
        init_res = float(self._state.init_res)
        if self.strict_init and not (init_res <= self.init_res_tol):
            raise RuntimeError(
                f"steady-state init failed: Newton residual {init_res:.3e} > "
                f"tol {self.init_res_tol:g} (randomized scenario too "
                "aggressive for the Newton basin — see pvderx.checks)")
        return np.asarray(obs, np.float32), {"init_res": init_res}

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


class PVDERVectorEnv(_VBASE):
    """Batched Gymnasium `VectorEnv` over the jitted TPU path.

    The reference has no vectorized env (SURVEY.md §2.5: 1 env, 1 process);
    this is the TPU-native extension that lets Gymnasium-based RL libraries
    drive N jit(vmap)-stepped envs (Pallas window kernel on TPU) as one
    vector env. Autoreset is SAME_STEP: when an episode ends, the returned
    observation is already the reset one and `infos["final_obs"]` carries the
    pre-reset observation (Gymnasium 1.x `AutoresetMode.SAME_STEP` contract).
    """

    metadata = {"autoreset_mode": (gym.vector.AutoresetMode.SAME_STEP
                                   if _HAS_GYM else None)}

    def __init__(self, num_envs: int, preset: str = "10", seed: int = 0,
                 cfg: core.EnvConfig | None = None, window: str = "auto",
                 block: int = 4096, mesh=None, **cfg_kw):
        """mesh: optional `jax.sharding.Mesh` with an 'env' axis — routes the
        window kernel through `jax.shard_map` so each chip runs it on its
        local batch shard (pvderx/env/vector.py multi-chip contract)."""
        from functools import partial

        from pvderx.env import vector

        self.num_envs = int(num_envs)
        self.cfg = cfg if cfg is not None else core.make_env_config(preset, **cfg_kw)
        self.render_mode = None
        self._key = jax.random.PRNGKey(seed)
        self._state = None

        cfg_ = self.cfg

        @jax.jit
        def _reset(keys):
            return jax.vmap(lambda k: core.reset(cfg_, k))(keys)

        @partial(jax.jit, donate_argnums=(0,))
        def _step(state, actions):
            st1, obs_f, rew, done, info = vector._step_batch_impl(
                cfg_, state, actions, window=window, block=block,
                autoreset=False, mesh=mesh)
            st_r, obs_r = jax.vmap(lambda s: core._soft_reset(cfg_, s))(st1)
            st2 = jax.tree.map(partial(vector._where_done, done), st_r, st1)
            obs2 = vector._where_done(done, obs_r, obs_f)
            return st2, obs2, obs_f, rew, done, info

        self._reset_fn = _reset
        self._step_fn = _step

        if _HAS_GYM:
            from gymnasium.vector.utils import batch_space
            if cfg_.continuous:
                self.single_action_space = spaces.Box(
                    low=-1.0, high=1.0, shape=(core.ACT_DIM_CONT,),
                    dtype=np.float32)
            elif cfg_.anomaly_detect:
                self.single_action_space = spaces.Discrete(core.N_ACTIONS_ANOM)
            else:
                self.single_action_space = spaces.Discrete(core.N_ACTIONS)
            self.single_observation_space = spaces.Box(
                low=-np.inf, high=np.inf, shape=(core.OBS_DIM,),
                dtype=np.float32)
            self.action_space = batch_space(self.single_action_space,
                                            self.num_envs)
            self.observation_space = batch_space(
                self.single_observation_space, self.num_envs)

    def reset(self, *, seed=None, options=None):
        if _HAS_GYM:
            super().reset(seed=seed, options=options)
        if seed is not None:
            self._key = jax.random.PRNGKey(int(seed))
        self._key, k = jax.random.split(self._key)
        keys = jax.random.split(k, self.num_envs)
        self._state, obs = self._reset_fn(keys)
        return (np.asarray(obs, np.float32),
                {"init_res": np.asarray(self._state.init_res)})

    def step(self, actions):
        if self.cfg.continuous:
            a = jnp.asarray(np.asarray(actions, np.float32))
        else:
            a = jnp.asarray(np.asarray(actions), jnp.int32)
        self._state, obs, obs_final, rew, done, info = self._step_fn(
            self._state, a)
        info_np = {k: np.asarray(v) for k, v in info.items()}
        terminated = info_np.pop("terminated")
        truncated = info_np.pop("truncated")
        if bool(np.any(done)):
            info_np["final_obs"] = np.asarray(obs_final, np.float32)
            info_np["_final_obs"] = np.asarray(done, bool)
        return (np.asarray(obs, np.float32), np.asarray(rew, np.float32),
                terminated, truncated, info_np)

    def close_extras(self, **kwargs):
        self._state = None


class PVDERFleetEnv(_BASE):
    """Gymnasium adapter for the multi-DER shared-feeder fleet env
    (BASELINE config 5; `pvderx.env.fleet`): M inverters per episode.
    Aggregate mode (default): one fleet-level Discrete(5) action, Box(13)
    aggregate observation. Per-unit mode (``per_unit=True``, round 5):
    MultiDiscrete([5]*M) action — one channel per inverter — and
    Box(13 + 4M) observation with the per-unit [Vdc | P | Q | conn] block
    (pvderx/env/fleet.py module docstring). The reference has no fleet
    concept (1 DER per sim, SURVEY.md §2.5) — this is the pvderx extension
    surface; the batched TPU path is `pvderx.env.fleet.make_fleet_batch_fns`."""

    metadata = {"render_modes": ["ansi"]}

    def __init__(self, preset: str = "10", m: int = 16, seed: int = 0,
                 render_mode=None, fc=None, per_unit: bool = False, **cfg_kw):
        from pvderx.env import fleet

        self.fc = fc if fc is not None else fleet.make_fleet_config(
            preset, m=m, per_unit=per_unit, **cfg_kw)
        if self.fc.base.continuous or self.fc.base.anomaly_detect:
            raise ValueError(
                "the fleet env is Discrete(5)-only: continuous/anomaly_detect "
                "modes are single-DER features (pvderx/PVDER-v0); "
                "fleet._pre_window would silently ignore them")
        self._reset_fn = jax.jit(lambda k: fleet.reset(self.fc, k))
        self._step_fn = jax.jit(lambda s, a: fleet.step(self.fc, s, a))
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._last = None
        self.render_mode = render_mode
        if _HAS_GYM:
            from pvderx.env.fleet import fleet_obs_dim
            self.action_space = (
                spaces.MultiDiscrete([core.N_ACTIONS] * self.fc.m)
                if self.fc.per_unit else spaces.Discrete(core.N_ACTIONS))
            self.observation_space = spaces.Box(
                low=-np.inf, high=np.inf, shape=(fleet_obs_dim(self.fc),),
                dtype=np.float32)

    def reset(self, *, seed=None, options=None):
        if _HAS_GYM:
            super().reset(seed=seed, options=options)
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset_fn(k)
        self._last = None
        return (np.asarray(obs, np.float32),
                {"init_res": float(self._state.init_res)})

    def step(self, action):
        if self.fc.per_unit:
            a = jnp.asarray(np.asarray(action).reshape(self.fc.m), jnp.int32)
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
            return f"PVDERFleet(m={self.fc.m}, t=0)"
        i = self._last
        return (f"t={int(self._state.t_step)} m={self.fc.m} "
                f"Vdc={float(i['vdc']):.4f} |V|={float(i['v_mag']):.3f} "
                f"P={float(i['p_pcc']):.3f} "
                f"tripped={float(i['tripped_frac']):.2f}")


def register_envs():
    """Register `pvderx/PVDER-v0` (reference: `PVDER-v0`) and the fleet
    extension `pvderx/PVDERFleet-v0` with Gymnasium."""
    if not _HAS_GYM:
        return
    from gymnasium.envs.registration import register, registry
    if "pvderx/PVDER-v0" not in registry:
        register(id="pvderx/PVDER-v0",
                 entry_point="pvderx.env.gym_adapter:PVDEREnv",
                 vector_entry_point="pvderx.env.gym_adapter:PVDERVectorEnv")
    if "pvderx/PVDERFleet-v0" not in registry:
        register(id="pvderx/PVDERFleet-v0",
                 entry_point="pvderx.env.gym_adapter:PVDERFleetEnv")


if _HAS_GYM:
    register_envs()
