"""Worker for the simulated 2-process multi-host test (SURVEY.md §4 item 4).

Launched twice by tests/test_dist.py::test_two_process_distributed_rollout
(once per process id). Each process owns 4 virtual CPU devices; the global
mesh spans 8 devices across both processes; the env batch is sharded over it
and stepped; per-step rewards are allgathered and checksummed against a
purely-local reference computation. Exercises: jax.distributed.initialize,
global mesh construction, make_array_from_process_local_data, cross-process
collectives (Gloo on CPU; ICI/DCN on real pods). The "tp" invocation adds
two more legs: a PPO train step on a 2-D (env, model) mesh whose model axis
crosses the process boundary, and the shard_map'd production window-kernel
path on the cross-process 'env' mesh (each process's devices run the kernel
on their local 128-env shards), checked against the scan path.

Usage: python multihost_launch.py <process_id> <coordinator_port>
"""
import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from pvderx.dist import (  # noqa: E402
    global_mesh, init_multihost, make_global_array, process_env_slice,
    sync_hosts)

init_multihost(coordinator_address=f"localhost:{port}", num_processes=2,
               process_id=proc_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from pvderx.env import make_env_config  # noqa: E402
from pvderx.env.vector import make_batch_fns  # noqa: E402

assert jax.process_count() == 2 and jax.device_count() == 8

N = 16
cfg = make_env_config("10", n_sub=40, horizon=50)
mesh = global_mesh()

keys_np = np.asarray(jax.random.split(jax.random.PRNGKey(0), N))
sl = process_env_slice(N)
keys = make_global_array(keys_np[sl], mesh, N)

rb, sb = make_batch_fns(cfg, donate=False, window="scan")
st, obs = rb(keys)
acts_np = np.zeros((N,), np.int32)
acts = make_global_array(acts_np[sl], mesh, N)
total = None
for k in range(5):
    st, obs, rew, done, info = sb(st, acts)
    r = multihost_utils.process_allgather(rew, tiled=True)
    total = r if total is None else total + r

# purely-local reference on this process's own devices (no sharding)
rb_l, sb_l = make_batch_fns(cfg, donate=False, window="scan")
st_l, _ = rb_l(jnp.asarray(keys_np))
total_l = None
for k in range(5):
    st_l, _, rew_l, _, _ = sb_l(st_l, jnp.asarray(acts_np))
    total_l = rew_l if total_l is None else total_l + rew_l

err = float(np.max(np.abs(np.asarray(total) - np.asarray(total_l))))

# --- optional TP leg: PPO train step on a 2-D (env, model) mesh whose model
# axis spans BOTH processes (cross-process Gloo collectives for the Megatron
# layers; ICI on a real pod). SURVEY.md §2.5 TP row, multi-host flavor. ---
tp_ok = True
if len(sys.argv) > 3 and sys.argv[3] == "tp":
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from pvderx.dist.tp import MODEL_AXIS, shard_runner_tp
    from pvderx.learn import PPOConfig, make_ppo

    # 4x2 global mesh: model-axis pairs are (proc0_dev_i, proc1_dev_i), so
    # every TP collective crosses the process boundary
    devs = np.stack([jax.devices()[:4], jax.devices()[4:]], axis=1)
    mesh2 = Mesh(devs, ("env", MODEL_AXIS))
    cfg_tp = make_env_config("10", n_sub=40, horizon=8)
    ppo = PPOConfig(rollout_len=2, n_epochs=1, n_minibatch=2)
    init_runner, train_step, _ = make_ppo(cfg_tp, ppo)
    # identical seed on both processes -> identical host-local runner, then
    # globally placed on the 2-D mesh
    runner = init_runner(jax.random.PRNGKey(7), 8)
    runner = shard_runner_tp(runner, mesh2)
    k0 = runner.params["params"]["Dense_0"]["kernel"]
    assert k0.sharding.spec == P(None, MODEL_AXIS), k0.sharding
    out, metrics = jax.jit(train_step)(runner)
    loss = float(np.ravel(multihost_utils.process_allgather(
        metrics["loss"], tiled=True))[0])
    tp_ok = bool(np.isfinite(loss))

# --- kernel leg: the PRODUCTION window-kernel path (shard_map over the
# global 'env' axis) on a mesh spanning BOTH processes — each process's
# devices run the kernel on their local 128-env shards (interpret mode on
# CPU, Mosaic on a real pod). Must agree with the scan path. ---
kernel_ok = True
if len(sys.argv) > 3 and sys.argv[3] == "tp":
    N_K = 128 * 8
    cfg_k = make_env_config("10", n_sub=40, horizon=8)
    rbk, sbk = make_batch_fns(cfg_k, donate=False, window="pallas",
                              block=128, mesh=mesh)
    _, sbk_scan = make_batch_fns(cfg_k, donate=False, window="scan")
    keys_k = np.asarray(jax.random.split(jax.random.PRNGKey(3), N_K))
    slk = process_env_slice(N_K)
    kk = make_global_array(keys_k[slk], mesh, N_K)
    stk, obsk = rbk(kk)
    actsk = make_global_array(
        np.arange(N_K, dtype=np.int32)[slk] % 5, mesh, N_K)
    _, o_kern, r_kern, d_kern, _ = sbk(stk, actsk)
    _, o_scan, r_scan, d_scan, _ = sbk_scan(stk, actsk)
    o_k = np.asarray(multihost_utils.process_allgather(o_kern, tiled=True))
    o_s = np.asarray(multihost_utils.process_allgather(o_scan, tiled=True))
    kernel_ok = bool(np.isfinite(o_k).all()
                     and np.max(np.abs(o_k - o_s)) < 1e-5)

sync_hosts("done")
print(f"RESULT proc={proc_id} err={err:.3e} "
      f"ok={err == 0.0 and tp_ok and kernel_ok}", flush=True)
