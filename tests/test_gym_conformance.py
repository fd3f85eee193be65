"""Real Gymnasium conformance checkers (SURVEY.md §4 item 3).

`gymnasium.utils.env_checker.check_env` is the authoritative API contract
test (spaces, reset/step return types, seed determinism, step determinism,
render). Gymnasium 1.2 ships no vector-env checker, so the vector test below
mirrors the same rules by hand against the `batch_space`d spaces and the
SAME_STEP autoreset contract the adapter declares.
"""
import warnings

import gymnasium as gym
import numpy as np
import pytest
from gymnasium.utils.env_checker import check_env

import pvderx.env.gym_adapter  # noqa: F401  (registers pvderx/PVDER-v0)
from pvderx.env.gym_adapter import PVDEREnv, PVDERVectorEnv

VARIANTS = [dict(), dict(continuous=True), dict(anomaly_detect=True)]


@pytest.mark.parametrize("kw", VARIANTS,
                         ids=["discrete", "continuous", "anomaly"])
def test_check_env_all_variants(kw):
    env = PVDEREnv("10", n_sub=40, **kw)
    with warnings.catch_warnings():
        # ±inf observation bounds are intentional (unbounded measurements);
        # everything else the checker flags is a real failure
        warnings.simplefilter("error")
        warnings.filterwarnings("ignore", message=".*Box observation space.*")
        warnings.filterwarnings("ignore", message=".*render modes.*")
        check_env(env, skip_render_check=False)


def test_check_env_fleet():
    """The fleet adapter (BASELINE config 5 surface) passes the real
    checker too."""
    from pvderx.env.gym_adapter import PVDERFleetEnv

    env = PVDERFleetEnv("10", m=4, n_sub=40, horizon=12)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        warnings.filterwarnings("ignore", message=".*Box observation space.*")
        warnings.filterwarnings("ignore", message=".*render modes.*")
        check_env(env, skip_render_check=False)
    env2 = gym.make("pvderx/PVDERFleet-v0", m=4, n_sub=40, horizon=12)
    obs, info = env2.reset(seed=1)
    assert info["init_res"] < 1e-3 and obs.shape == (13,)
    env2.close()
    # single-DER-only modes are rejected, not silently ignored
    with pytest.raises(ValueError, match="Discrete.5.-only"):
        PVDERFleetEnv("10", m=4, n_sub=40, anomaly_detect=True)
    with pytest.raises(ValueError, match="Discrete.5.-only"):
        PVDERFleetEnv("10", m=4, n_sub=40, continuous=True)


def test_check_env_registered_id():
    env = gym.make("pvderx/PVDER-v0", n_sub=40)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        check_env(env.unwrapped)
    env.close()


def test_vector_env_contract():
    """Hand-rolled vector checker: spaces = batch_space(single), obs/reward/
    done shapes and dtypes, seed determinism, SAME_STEP autoreset info."""
    n = 8
    env = gym.make_vec("pvderx/PVDER-v0", num_envs=n, n_sub=40, horizon=5)
    assert isinstance(env.unwrapped, PVDERVectorEnv)
    from gymnasium.vector.utils import batch_space

    assert env.observation_space == batch_space(env.single_observation_space, n)
    assert env.action_space == batch_space(env.single_action_space, n)

    obs1, info1 = env.reset(seed=123)
    obs2, info2 = env.reset(seed=123)
    np.testing.assert_array_equal(obs1, obs2)  # seed determinism
    assert obs1.shape == (n, env.single_observation_space.shape[0])
    assert obs1 in env.observation_space
    assert np.all(info1["init_res"] < 1e-3)

    rng = np.random.default_rng(0)
    done_seen = False
    for _ in range(6):  # horizon 5 -> guaranteed truncation
        acts = rng.integers(0, env.single_action_space.n, size=n)
        obs, rew, term, trunc, info = env.step(acts)
        assert obs in env.observation_space
        assert obs.dtype == np.float32 and rew.shape == (n,)
        assert term.shape == (n,) and trunc.shape == (n,)
        done = np.logical_or(term, trunc)
        if np.any(done):
            done_seen = True
            # SAME_STEP autoreset: obs is already the reset obs; the
            # pre-reset observation rides in info["final_obs"]
            assert "final_obs" in info and "_final_obs" in info
            assert info["final_obs"].shape == obs.shape
            np.testing.assert_array_equal(info["_final_obs"], done)
            assert not np.allclose(info["final_obs"][done], obs[done])
    assert done_seen
    env.close()


def test_vector_env_matches_single_env():
    """Vector env row 0 with the same PRNG key as a single env produces the
    same trajectory (vmap-vs-single equivalence at the adapter level)."""
    import jax

    cfg_kw = dict(n_sub=40, horizon=16)
    venv = PVDERVectorEnv(num_envs=4, preset="10", **cfg_kw)
    senv = PVDEREnv("10", **cfg_kw)

    venv.reset(seed=5)
    keys = jax.random.split(
        jax.random.split(jax.random.PRNGKey(5))[1], 4)
    # drive the single env from the exact key the vector env used for row 0
    senv._key = None
    senv._state, sobs = senv._reset_fn(keys[0])
    vobs = np.asarray(venv._state.y[0])
    np.testing.assert_allclose(np.asarray(senv._state.y), vobs, rtol=0,
                               atol=1e-6)
    for a in (0, 1, 3, 2):
        vo, vr, vterm, vtrunc, _ = venv.step(np.full(4, a))
        so, sr, sterm, strunc, _ = senv.step(a)
        np.testing.assert_allclose(so, vo[0], rtol=0, atol=2e-5)
        np.testing.assert_allclose(sr, vr[0], rtol=0, atol=2e-5)
