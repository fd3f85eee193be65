"""Environment contract tests (SPEC.md §9; SURVEY.md §4 items 3,5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx._pytree import replace
from pvderx.env import (
    EnvConfig, N_ACTIONS, OBS_DIM, make_env_config, reset, step, step_autoreset,
)
from pvderx.env.vector import make_batch_fns, rollout
from pvderx.scenario import EventBuilder


@pytest.fixture(scope="module")
def cfg():
    return make_env_config("10", dtype=jnp.float32)


def test_reset_deterministic(cfg):
    k = jax.random.PRNGKey(7)
    st1, o1 = reset(cfg, k)
    st2, o2 = reset(cfg, k)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_reset_steady(cfg):
    """Initial obs: Vdc at ref, Q at 0, connected, t=0."""
    st, obs = reset(cfg, jax.random.PRNGKey(3))
    o = np.asarray(obs)
    assert o.shape == (OBS_DIM,)
    assert abs(o[4] - 1.0) < 1e-3     # Vdc
    assert abs(o[6]) < 1e-3           # Q_pcc
    assert o[12] == 1.0               # conn
    assert o[11] == 0.0               # t/T


def test_step_bitwise_deterministic(cfg):
    st, _ = reset(cfg, jax.random.PRNGKey(5))
    f = jax.jit(lambda s, a: step(cfg, s, a))
    outs = []
    for _ in range(2):
        s = st
        tot = 0.0
        for k in range(20):
            s, o, r, d, i = f(s, jnp.int32(k % N_ACTIONS))
        outs.append(np.asarray(o))
    assert np.array_equal(outs[0], outs[1])


def test_q_action_nudges_setpoint(cfg):
    st, _ = reset(cfg, jax.random.PRNGKey(1))
    f = jax.jit(lambda s, a: step(cfg, s, a))
    s = st
    for _ in range(3):
        s, o, r, d, i = f(s, jnp.int32(1))
    assert abs(float(s.q_ref) - 3 * 0.01) < 1e-6
    for _ in range(60):
        s, o, r, d, i = f(s, jnp.int32(0))
    assert abs(float(i["q_pcc"]) - 0.03) < 5e-3  # Q loop tracks


def test_setpoint_clipping(cfg):
    st, _ = reset(cfg, jax.random.PRNGKey(1))
    f = jax.jit(lambda s, a: step(cfg, s, a))
    s = st
    for _ in range(80):
        s, *_ = f(s, jnp.int32(2))  # Q- repeatedly
    assert float(s.q_ref) == pytest.approx(float(cfg.q_lo))


def test_deep_sag_trips_and_terminates(cfg):
    """LV2 sag (0.3 pu) -> momentary cessation, then latched trip + penalty."""
    st, _ = reset(cfg, jax.random.PRNGKey(2))
    ev = EventBuilder()
    ev.add_grid_event(0.05, v=0.3)
    st = replace(st, sched=ev.build())
    f = jax.jit(lambda s, a: step(cfg, s, a))
    s = st
    rewards, done_at = [], None
    for k in range(140):
        s, o, r, d, i = f(s, jnp.int32(0))
        rewards.append(float(r))
        if bool(d):
            done_at = k
            break
    assert done_at is not None, "env must terminate on LV2 trip"
    # LV2 limit is 1.0 s => trip within ~1.2 s of the sag
    assert done_at < 80
    assert rewards[-1] < -50.0           # trip penalty dominates
    assert float(i["tripped"]) == 1.0
    assert bool(i["terminated"]) and not bool(i["truncated"])
    assert np.asarray(o)[12] == 0.0      # conn=0 in obs


def test_horizon_truncation():
    cfg5 = make_env_config("10", horizon=5)
    st, _ = reset(cfg5, jax.random.PRNGKey(0))
    f = jax.jit(lambda s, a: step(cfg5, s, a))
    s = st
    for k in range(5):
        s, o, r, d, i = f(s, jnp.int32(0))
    assert bool(d) and bool(i["truncated"]) and not bool(i["terminated"])


def test_autoreset_restarts_episode():
    cfg5 = make_env_config("10", horizon=3)
    st, _ = reset(cfg5, jax.random.PRNGKey(0))
    f = jax.jit(lambda s, a: step_autoreset(cfg5, s, a))
    s = st
    for k in range(3):
        s, o, r, d, i = f(s, jnp.int32(0))
    assert bool(d)
    assert int(s.t_step) == 0            # restarted
    np.testing.assert_allclose(np.asarray(s.y), np.asarray(s.y0))


def test_vmap_matches_single(cfg):
    """vmap(step)(batch)[i] == step(env_i) — SURVEY.md §4 item 3."""
    N = 8
    rb, sb = make_batch_fns(cfg, donate=False)
    keys = jax.random.split(jax.random.PRNGKey(9), N)
    stb, obsb = rb(keys)
    acts = jnp.arange(N, dtype=jnp.int32) % N_ACTIONS
    stb2, obsb2, r2, d2, _ = sb(stb, acts)
    f = jax.jit(lambda s, a: step_autoreset(cfg, s, a))
    for idx in [0, 3, 7]:
        st_i = jax.tree.map(lambda x: x[idx], stb)
        _, o, r, d, _ = f(st_i, acts[idx])
        np.testing.assert_array_equal(np.asarray(o), np.asarray(obsb2[idx]))
        assert float(r) == float(r2[idx])


def test_rollout_runs_and_mppt_voltvar_variants():
    for kw in (dict(mppt_enable=True), dict(voltvar_enable=True)):
        c = make_env_config("10", horizon=50, **kw)
        rb, sb = make_batch_fns(c, donate=False)
        stb, obsb = rb(jax.random.split(jax.random.PRNGKey(0), 4))
        pol = lambda ob, k: jax.random.randint(k, (ob.shape[0],), 0, N_ACTIONS)
        stf, obsf, rews, dones = jax.jit(
            lambda s, o, k: rollout(c, s, o, pol, 20, k)
        )(stb, obsb, jax.random.PRNGKey(1))
        assert rews.shape == (20, 4)
        assert np.all(np.isfinite(np.asarray(rews)))


def test_gymnasium_adapter():
    gym = pytest.importorskip("gymnasium")
    from pvderx.env.gym_adapter import PVDEREnv
    env = PVDEREnv(preset="10", horizon=30)
    obs, info = env.reset(seed=0)
    assert obs.shape == (OBS_DIM,)
    total = 0.0
    for k in range(30):
        obs, r, term, trunc, info = env.step(env.action_space.sample())
        total += r
        if term or trunc:
            break
    assert trunc and k == 29
    assert "Vdc" in env.render()
    # registered id
    e2 = gym.make("pvderx/PVDER-v0", horizon=10)
    o, _ = e2.reset(seed=1)
    assert o.shape == (OBS_DIM,)


def test_chunked_reset_matches_direct(monkeypatch):
    """The compile-time reset chunking (vector.RESET_CHUNK, round 5): a batch
    reset lax.map'd at a fixed chunk width must reproduce the direct-vmap
    reset — obs bitwise, state to <1e-9 (below one f32 obs ulp; measured
    bitwise-equal obs on the real chip at 32k envs)."""
    from pvderx.env import core, vector

    env_cfg = make_env_config("10", dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), 256)
    direct_st, direct_obs = jax.jit(
        lambda ks: jax.vmap(lambda k: core.reset(env_cfg, k))(ks))(keys)
    monkeypatch.setattr(vector, "RESET_CHUNK", 64)
    reset_b, _ = vector.make_batch_fns(env_cfg)
    st, obs = reset_b(keys)
    assert jnp.array_equal(obs, direct_obs)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(direct_st)):
        if a.dtype.kind == "f":
            # a == b handles the inf event-table rows (inf - inf = nan)
            d = jnp.where(a == b, 0.0, jnp.abs(a - b))
            assert float(jnp.max(d)) < 1e-9
        else:
            assert jnp.array_equal(a, b)
    # non-divisible batches fall back to the direct path inside the same jit
    keys2 = jax.random.split(jax.random.PRNGKey(7), 96)
    st2, obs2 = reset_b(keys2)
    assert obs2.shape[0] == 96


def test_df32_env_tier_contract():
    """The env-surface df32 tier (vector.make_batch_fns_df, round 5): same
    env contract as the f32 path (obs/reward/done track it to f32 noise),
    while the lo residual is genuinely carried across steps and zeroed on
    auto-reset. Kernel-level accuracy (8.9e-7 vs LSODA) is gated separately
    in benchmarks/DUALFLOAT.json + tests/test_ops.py; this pins the
    plumbing."""
    from pvderx.env import vector

    env_cfg = make_env_config("10", dtype=jnp.float32, n_sub=48, horizon=4)
    n = 128
    keys = jax.random.split(jax.random.PRNGKey(5), n)
    reset_df, step_df = vector.make_batch_fns_df(env_cfg)
    carry, obs0 = reset_df(keys)
    reset_b, step_b = vector.make_batch_fns(env_cfg, window="scan")
    st_f, obs_f = reset_b(keys)
    np.testing.assert_array_equal(np.asarray(obs0), np.asarray(obs_f))

    acts = jnp.zeros((n,), jnp.int32)
    for k in range(3):
        carry, obs, rew, done, info = step_df(carry, acts)
        st_f, obs_f, rew_f, done_f, _ = step_b(st_f, acts)
        np.testing.assert_allclose(np.asarray(obs), np.asarray(obs_f),
                                   rtol=0, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(done), np.asarray(done_f))
        assert not bool(jnp.any(done))  # horizon=4: no env done yet
    st2, y_lo = carry
    # the lo residual is alive (sub-ulp integration state is being carried)
    assert float(jnp.max(jnp.abs(y_lo))) > 0.0
    # 4th step truncates every env -> autoreset zeroes the lo residual
    carry, obs, rew, done, info = step_df(carry, acts)
    assert bool(jnp.all(done))
    st3, y_lo3 = carry
    assert float(jnp.max(jnp.abs(y_lo3))) == 0.0
    assert int(st3.t_step.max()) == 0   # episodes restarted


def test_block_fallback_keeps_kernel_for_odd_batches():
    """Round-5 review regression: after the block default re-tune
    (4096→2048), batch sizes that are 128-multiples but not block-multiples
    (e.g. 3072) must still run the fused kernel as one whole-batch block —
    not silently demote to the ~20x slower scan path or make an explicit
    window='pallas' raise."""
    from pvderx.env import core, vector

    cfg3 = make_env_config("10", dtype=jnp.float32, n_sub=48, horizon=20)
    n = 384   # 3 x 128: not a multiple of any >=1024 block
    assert vector._effective_block(n, 2048) == n
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    st, obs = jax.jit(lambda ks: jax.vmap(lambda k: core.reset(cfg3, k))(ks))(keys)
    acts = jnp.zeros((n,), jnp.int32)
    # explicit pallas must be accepted (interpret kernel on CPU) and agree
    # with scan
    o_p = vector._step_batch_impl(cfg3, st, acts, window="pallas",
                                  block=2048, autoreset=True)
    o_s = vector._step_batch_impl(cfg3, st, acts, window="scan",
                                  block=2048, autoreset=True)
    np.testing.assert_allclose(np.asarray(o_p[1], np.float64),
                               np.asarray(o_s[1], np.float64), atol=5e-5)
