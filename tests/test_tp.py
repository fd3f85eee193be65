"""Optional tensor parallelism (SURVEY.md §2.5 TP row): a 2-D (env, model)
mesh with Megatron-style partition rules on the learner MLP reproduces the
1-D env-only results — same math, different layout/collectives."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pvderx._pytree import replace
from pvderx.dist import (
    ENV_AXIS, MODEL_AXIS, make_mesh, make_mesh_2d, param_partition_specs,
    shard_runner_tp,
)
from pvderx.env import make_env_config
from pvderx.learn import PPOConfig, make_ppo

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh")


def _tiny_setup(dtype=jnp.float32):
    cfg = make_env_config("10", dtype=dtype, n_sub=40, horizon=8)
    ppo = PPOConfig(rollout_len=4, n_epochs=1, n_minibatch=2)
    return make_ppo(cfg, ppo, hidden=(128, 128), dtype=dtype)


def test_partition_specs_megatron_alternation():
    init_runner, train_step, net = _tiny_setup()
    runner = init_runner(jax.random.PRNGKey(0), 8)
    specs = param_partition_specs(runner.params, n_model=2)
    d = specs["params"]
    assert d["Dense_0"]["kernel"] == P(None, MODEL_AXIS)   # column-parallel
    assert d["Dense_0"]["bias"] == P(MODEL_AXIS)
    assert d["Dense_1"]["kernel"] == P(MODEL_AXIS, None)   # row-parallel
    assert d["Dense_1"]["bias"] == P()
    assert d["Dense_2"]["kernel"] == P()                   # logits head (5)
    assert d["Dense_3"]["kernel"] == P(MODEL_AXIS, None)   # value head row-par


def test_tp_train_step_matches_dp_only():
    """One full PPO train step on a 4x2 (env, model) mesh == the 1-D 8-way
    env mesh, to float32 reduction-order tolerance; params stay TP-sharded."""
    init_runner, train_step, _net = _tiny_setup()
    runner0 = init_runner(jax.random.PRNGKey(0), 16)
    ts = jax.jit(train_step)

    # --- 1-D env-only placement (the default layout) ---
    mesh1 = make_mesh(8)
    env_sh = NamedSharding(mesh1, P(ENV_AXIS))
    rep = NamedSharding(mesh1, P())
    put = lambda tree, sh: jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    r1 = replace(
        runner0,
        params=put(runner0.params, rep), opt_state=put(runner0.opt_state, rep),
        env_state=put(runner0.env_state, env_sh), obs=put(runner0.obs, env_sh),
        key=jax.device_put(runner0.key, rep),
        update_i=jax.device_put(runner0.update_i, rep))
    out1, m1 = ts(r1)

    # --- 2-D (env=4, model=2) TP placement ---
    mesh2 = make_mesh_2d(4, 2)
    r2 = shard_runner_tp(runner0, mesh2)
    # params are genuinely split over the model axis
    k0 = r2.params["params"]["Dense_0"]["kernel"]
    assert k0.sharding.spec == P(None, MODEL_AXIS)
    assert len(k0.sharding.device_set) == 8
    out2, m2 = ts(r2)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    for leaf1, leaf2 in zip(jax.tree.leaves(out1.params),
                            jax.tree.leaves(out2.params)):
        np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf2),
                                   rtol=1e-5, atol=1e-6)
    # Adam moments inherited the TP sharding (no host-side spec surgery)
    mu0 = out2.opt_state[1][0].mu["params"]["Dense_0"]["kernel"]
    assert mu0.sharding.spec == P(None, MODEL_AXIS)


def test_shard_runner_tp_preserves_optimizer_state():
    """Placing a mid-training runner on a TP mesh must keep the Adam
    moments (a checkpoint-restored runner is a continuation, not a
    restart)."""
    init_runner, train_step, _net = _tiny_setup()
    runner = init_runner(jax.random.PRNGKey(1), 16)
    trained, _ = jax.jit(train_step)(runner)  # nonzero mu/nu + count=updates

    mesh2 = make_mesh_2d(4, 2)
    placed = shard_runner_tp(trained, mesh2)
    for old, new in zip(jax.tree.leaves(trained.opt_state),
                        jax.tree.leaves(placed.opt_state)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    mu0 = placed.opt_state[1][0].mu["params"]["Dense_0"]["kernel"]
    assert mu0.sharding.spec == P(None, MODEL_AXIS)
    assert float(np.max(np.abs(np.asarray(mu0)))) > 0.0


@pytest.mark.slow
def test_checkpoint_restore_onto_tp_mesh(tmp_path):
    """Checkpoint saved from a 1-D env-mesh run restores onto the 2-D
    (env, model) TP mesh and continues identically — resume across
    resharding (SURVEY.md §4 determinism item)."""
    from pvderx.diag.checkpoint import restore, save

    init_runner, train_step, _net = _tiny_setup()
    runner = init_runner(jax.random.PRNGKey(2), 16)
    ts = jax.jit(train_step)
    trained, _ = ts(runner)

    path = str(tmp_path / "ckpt")
    save(path, trained)

    mesh2 = make_mesh_2d(4, 2)
    target = shard_runner_tp(trained, mesh2)
    restored = restore(path, target)
    k0 = restored.params["params"]["Dense_0"]["kernel"]
    assert k0.sharding.spec == P(None, MODEL_AXIS)

    out_direct, m_direct = ts(target)
    out_restored, m_restored = ts(restored)
    np.testing.assert_allclose(float(m_direct["loss"]),
                               float(m_restored["loss"]), rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(out_direct.params),
                    jax.tree.leaves(out_restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
