"""Microbench: fused window kernel alone vs full env step at N envs.

Separates the Pallas window integration from the XLA glue (pre/post window,
events, obs/reward, autoreset) to direct optimization effort.
"""
import os, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from pvderx.diag.profiler import force_sync
from pvderx.env import make_env_config
from pvderx.env.vector import make_batch_fns, rollout
from pvderx.ops.window import (P_FIELDS, U_FIELDS, pack_struct,
                               rk4_window_batch)
from pvderx.env import core

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
NSUB = 64
CHUNK = 480

cfg = make_env_config("10", dtype=jnp.float32, n_sub=NSUB)
reset_b, step_b = make_batch_fns(cfg)
keys = jax.random.split(jax.random.PRNGKey(0), N)
state, obs = reset_b(keys)
force_sync(obs)

p_pack = pack_struct(state.der, P_FIELDS)
t, exog, mppt, flag = jax.jit(jax.vmap(lambda s, a: core._pre_window(cfg, s, a)))(
    state, jnp.zeros((N,), jnp.int32))
u_pack = pack_struct(exog, U_FIELDS)

# kernel-only loop: CHUNK windows back-to-back via lax.scan (same dispatch
# amortization as the full rollout)
def kern_chunk(y):
    def body(y, _):
        y1 = rk4_window_batch(y, t, p_pack, u_pack, n_ph=1, n_sub=NSUB,
                              dt=cfg.dt_ctrl, block=4096)
        return y1, ()
    y, _ = jax.lax.scan(body, y, None, length=CHUNK)
    return y

kc = jax.jit(kern_chunk, donate_argnums=(0,))
y = state.y
y = kc(y); force_sync(y)
ts = []
for _ in range(4):
    t0 = time.perf_counter(); y = kc(y); force_sync(y)
    ts.append(time.perf_counter() - t0)
tk = min(ts)
print(f"kernel-only: {tk:.3f}s/{CHUNK} windows -> {tk/CHUNK*1e3:.3f} ms/window "
      f"-> {N*CHUNK/tk:,.0f} env-windows/s")

if "--kernel-only" in sys.argv:
    sys.exit(0)

# full-step rollout (same as bench.py); fresh reset — state.y was donated above
state, obs = reset_b(keys)
policy = lambda ob, k: jnp.zeros((ob.shape[0],), jnp.int32)
ro = jax.jit(lambda s, o, k: rollout(cfg, s, o, policy, CHUNK, k),
             donate_argnums=(0, 1))
state, obs, rews, dones = ro(state, obs, jax.random.PRNGKey(1))
force_sync(rews)
ts = []
for r in range(4):
    t0 = time.perf_counter()
    state, obs, rews, dones = ro(state, obs, jax.random.PRNGKey(2 + r))
    force_sync(rews)
    ts.append(time.perf_counter() - t0)
tf = min(ts)
print(f"full step:   {tf:.3f}s/{CHUNK} steps  -> {tf/CHUNK*1e3:.3f} ms/step  "
      f"-> {N*CHUNK/tf:,.0f} env-steps/s")
print(f"glue share: {(tf-tk)/tf*100:.1f}%")
