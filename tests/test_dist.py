"""Mesh sharding + determinism tests on the 8-virtual-device CPU mesh
(SURVEY.md §4 items 4-5; conftest sets xla_force_host_platform_device_count=8).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pvderx._pytree import replace
from pvderx.dist import ENV_AXIS, make_mesh, replicate, shard_batch
from pvderx.env import make_env_config
from pvderx.env.vector import make_batch_fns
from pvderx.learn import PPOConfig, make_ppo


@pytest.fixture(scope="module")
def cfg():
    return make_env_config("10", n_sub=40, horizon=50)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_env_step_matches_single_device(cfg):
    """Same batch, 1-device vs 8-device mesh: identical results (resharding
    determinism, SURVEY §4 item 5)."""
    N = 16
    rb, sb = make_batch_fns(cfg, donate=False)
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    st, obs = rb(keys)
    acts = jnp.zeros((N,), jnp.int32)

    st_1, obs_1, r_1, d_1, _ = sb(st, acts)

    mesh = make_mesh(8)
    st_sh = shard_batch(st, mesh)
    acts_sh = shard_batch(acts, mesh)
    st_8, obs_8, r_8, d_8, _ = sb(st_sh, acts_sh)

    assert len(obs_8.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(obs_1), np.asarray(obs_8))
    np.testing.assert_array_equal(np.asarray(r_1), np.asarray(r_8))


def test_sharded_ppo_train_step(cfg):
    """Full PPO train step over the mesh: finite loss, sharded env, replicated
    params, and identical metrics vs single-device."""
    ppo = PPOConfig(rollout_len=4, n_epochs=1, n_minibatch=2)
    init_runner, train_step, _ = make_ppo(cfg, ppo)
    runner = init_runner(jax.random.PRNGKey(1), 16)
    ts = jax.jit(train_step)

    r1, m1 = ts(runner)

    mesh = make_mesh(8)
    runner_sh = replace(
        runner,
        params=replicate(runner.params, mesh),
        opt_state=replicate(runner.opt_state, mesh),
        env_state=shard_batch(runner.env_state, mesh),
        obs=shard_batch(runner.obs, mesh),
        key=replicate(runner.key, mesh),
        update_i=replicate(runner.update_i, mesh),
    )
    r8, m8 = ts(runner_sh)

    assert np.isfinite(float(m8["loss"]))
    assert len(r8.obs.sharding.device_set) == 8
    # params stay replicated; numerics match the single-device run closely
    # (reduction orders differ across shardings -> tolerance, not bitwise)
    p1 = jax.tree.leaves(r1.params)[0]
    p8 = jax.tree.leaves(r8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)
    assert float(m1["reward_mean"]) == pytest.approx(float(m8["reward_mean"]), abs=1e-6)


def test_rollout_bitwise_reproducible(cfg):
    """Same seed => bitwise-identical rollout, run twice (SURVEY §4 item 5)."""
    rb, sb = make_batch_fns(cfg, donate=False)
    outs = []
    for _ in range(2):
        st, obs = rb(jax.random.split(jax.random.PRNGKey(3), 8))
        for k in range(10):
            st, obs, r, d, _ = sb(st, jnp.full((8,), k % 5, jnp.int32))
        outs.append(np.asarray(obs))
    assert np.array_equal(outs[0], outs[1])


def test_graft_dryrun_entry():
    """The driver's multichip dry run must keep working."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_shard_runner_and_sac_over_mesh():
    """SAC runner sharded via shard_runner: env batch + replay on the mesh,
    params replicated; train step stays finite (SURVEY §2.5)."""
    from pvderx.dist import make_mesh, shard_runner
    from pvderx.learn import SACConfig, make_sac

    cfg_c = make_env_config("10", n_sub=40, horizon=50, continuous=True)
    sac = SACConfig(rollout_len=2, n_updates=1, batch_size=16, capacity=256)
    init_runner, train_step, _ = make_sac(cfg_c, sac)
    runner = init_runner(jax.random.PRNGKey(5), 16)
    mesh = make_mesh(8)
    runner_sh = shard_runner(runner, mesh)
    assert len(runner_sh.env_state.y.sharding.device_set) == 8
    r8, m8 = jax.jit(train_step)(runner_sh)
    assert np.isfinite(float(m8["critic_loss"]))


def test_process_env_slice_single_process():
    from pvderx.dist import process_env_slice
    sl = process_env_slice(64)
    assert (sl.start, sl.stop) == (0, 64)
    with pytest.raises(ValueError):
        process_env_slice(63) if jax.process_count() > 1 else (_ for _ in ()).throw(ValueError())


def test_two_process_distributed_rollout(tmp_path):
    """Simulated multi-host (SURVEY §4 item 4): 2 localhost processes x 4
    virtual devices, global 8-device mesh, env batch sharded across processes;
    rewards must equal a purely-local computation bitwise. The "tp" leg then
    runs a PPO train step on a 2-D (env, model) mesh whose model axis spans
    both processes (cross-process collectives for the Megatron-sharded
    layers)."""
    import subprocess, sys, os
    script = os.path.join(os.path.dirname(__file__), "multihost_launch.py")
    port = "46123"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, script, str(i), port, "tp"],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"RESULT proc={i}" in out and "ok=True" in out, out[-3000:]


def test_sharded_pallas_window_matches_single_device(cfg):
    """The fused Pallas window path must partition over the mesh (the
    learners route rollout collection through it — see pvderx/learn/*)."""
    N = 256
    rb, sb = make_batch_fns(cfg, donate=False, window="pallas", block=N)
    keys = jax.random.split(jax.random.PRNGKey(11), N)
    st, obs = rb(keys)
    acts = jnp.zeros((N,), jnp.int32)
    o1 = sb(st, acts)[1]
    mesh = make_mesh(8)
    o8 = sb(shard_batch(st, mesh), shard_batch(acts, mesh))[1]
    assert len(o8.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o8), atol=1e-5)


def test_shard_mapped_kernel_path_8way(cfg):
    """The MULTI-CHIP contract for the production kernel: `mesh=` routes the
    `pallas_call` through `jax.shard_map` over the 'env' axis, so each device
    runs the kernel on its LOCAL 128-env shard by construction (window=
    'pallas' would raise on the scan fallback — the kernel path is forced).
    Must agree with the unsharded scan path and stay 8-way sharded."""
    N = 1024  # 8 shards x 128 local envs — each shard tiles legally
    mesh = make_mesh(8)
    rb, sb_sm = make_batch_fns(cfg, donate=False, window="pallas",
                               block=128, mesh=mesh)
    _, sb_scan = make_batch_fns(cfg, donate=False, window="scan")
    keys = jax.random.split(jax.random.PRNGKey(12), N)
    st, obs = rb(keys)
    acts = jnp.arange(N, dtype=jnp.int32) % 5

    st_sh = shard_batch(st, mesh)
    acts_sh = shard_batch(acts, mesh)
    st1, o_sm, r_sm, d_sm, _ = sb_sm(st_sh, acts_sh)
    assert len(o_sm.sharding.device_set) == 8
    assert len(st1.y.sharding.device_set) == 8

    _, o_ref, r_ref, d_ref, _ = sb_scan(st, acts)
    np.testing.assert_allclose(np.asarray(o_sm), np.asarray(o_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_sm), np.asarray(r_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(d_sm), np.asarray(d_ref))


def test_shard_mapped_kernel_on_2d_mesh(cfg):
    """The kernel's shard_map must compose with the 2-D ('env','model') TP
    mesh: the batch shards over the 4-way env axis, the kernel result rides
    replicated over the 2-way model axis (the layout a TP learner run uses).
    """
    from pvderx.dist import make_mesh_2d, shard_batch

    N = 512  # 4 env-shards x 128 local envs
    mesh = make_mesh_2d(4, 2)
    rb, sb = make_batch_fns(cfg, donate=False, window="pallas", block=128,
                            mesh=mesh)
    _, sb_scan = make_batch_fns(cfg, donate=False, window="scan")
    keys = jax.random.split(jax.random.PRNGKey(21), N)
    st, obs = rb(keys)
    acts = jnp.arange(N, dtype=jnp.int32) % 5
    st1, o_sm, r_sm, d_sm, _ = sb(shard_batch(st, mesh),
                                  shard_batch(acts, mesh))
    assert len(o_sm.sharding.device_set) == 8  # spans the whole 2-D mesh
    _, o_ref, r_ref, d_ref, _ = sb_scan(st, acts)
    np.testing.assert_allclose(np.asarray(o_sm), np.asarray(o_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(d_sm), np.asarray(d_ref))


def test_mesh_non_divisible_batch_fallback(cfg):
    """A batch that doesn't divide across the env shards: window='auto'
    falls back to the scan path with a LOUD warning (the kernel is ~20x
    faster — silence would hide the cliff); window='pallas' raises."""
    import warnings

    from pvderx.env.fleet import make_fleet_batch_fns, make_fleet_config

    mesh = make_mesh(8)
    N = 12  # 12 % 8 != 0
    rb, sb = make_batch_fns(cfg, donate=False, window="auto", mesh=mesh)
    st, obs = rb(jax.random.split(jax.random.PRNGKey(30), N))
    with pytest.warns(UserWarning, match="falling back"):
        st1, o1, r1, d1, _ = sb(st, jnp.zeros((N,), jnp.int32))
    assert np.isfinite(np.asarray(o1)).all()

    _, sb_p = make_batch_fns(cfg, donate=False, window="pallas", block=128,
                             mesh=mesh)
    with pytest.raises(ValueError, match="divisible"):
        sb_p(st, jnp.zeros((N,), jnp.int32))

    # fleet twin of both branches
    fc = make_fleet_config("10", m=2, n_sub=40, horizon=16)
    frb, fsb = make_fleet_batch_fns(fc, donate=False, window="auto",
                                    mesh=mesh)
    fst, fobs = frb(jax.random.split(jax.random.PRNGKey(31), N))
    with pytest.warns(UserWarning, match="falling back"):
        fsb(fst, jnp.zeros((N,), jnp.int32))
    _, fsb_p = make_fleet_batch_fns(fc, donate=False, window="pallas",
                                    block=128, mesh=mesh)
    with pytest.raises(ValueError, match="divisible"):
        fsb_p(fst, jnp.zeros((N,), jnp.int32))


def test_shard_mapped_fleet_kernel_8way():
    """Same structural guarantee for the rank-4 fleet kernel: shard_map over
    'env' with M units per env riding along unsharded."""
    from pvderx.env.fleet import make_fleet_batch_fns, make_fleet_config

    fc = make_fleet_config("10", m=2, n_sub=40, horizon=16)
    N = 1024
    mesh = make_mesh(8)
    rb, sb_sm = make_fleet_batch_fns(fc, donate=False, window="pallas",
                                     block=128, mesh=mesh)
    _, sb_scan = make_fleet_batch_fns(fc, donate=False, window="scan")
    keys = jax.random.split(jax.random.PRNGKey(13), N)
    st, obs = rb(keys)
    acts = jnp.arange(N, dtype=jnp.int32) % 5
    _, o_sm, r_sm, d_sm, _ = sb_sm(shard_batch(st, mesh),
                                   shard_batch(acts, mesh))
    assert len(o_sm.sharding.device_set) == 8
    _, o_ref, r_ref, d_ref, _ = sb_scan(st, acts)
    np.testing.assert_allclose(np.asarray(o_sm), np.asarray(o_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(d_sm), np.asarray(d_ref))


def test_fleet_ppo_sharded_over_mesh():
    """BASELINE config 5 end-to-end shape: the fleet env + PPO learner with
    the env batch sharded over the mesh 'env' axis and params replicated
    (GSPMD inserts the gradient all-reduce)."""
    from pvderx.dist import make_mesh, shard_runner
    from pvderx.env.fleet import make_fleet_config
    from pvderx.learn import PPOConfig, make_ppo

    fc = make_fleet_config("10", m=4, n_sub=40, horizon=16)
    ppo = PPOConfig(rollout_len=2, n_epochs=1, n_minibatch=2)
    init_runner, train_step, _ = make_ppo(fc, ppo)
    runner = init_runner(jax.random.PRNGKey(7), 16)
    mesh = make_mesh(8)
    runner_sh = shard_runner(runner, mesh)
    assert len(runner_sh.env_state.y.sharding.device_set) == 8
    r8, m8 = jax.jit(train_step)(runner_sh)
    assert np.isfinite(float(m8["loss"]))
    assert len(r8.obs.sharding.device_set) == 8
