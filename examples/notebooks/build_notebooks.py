"""Generate + execute the demo notebooks (reference analog: the upstream
repos' demo notebooks, SURVEY.md §2.1 #13 — train DQN/PPO against PVDER-v0 and
run standalone simulations). Re-run this script to regenerate the .ipynb files
with fresh outputs:

    python examples/notebooks/build_notebooks.py
"""
import os
import sys

import nbformat as nbf
from nbclient import NotebookClient

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))

SETUP = f"""\
import sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")   # notebooks run anywhere; on a TPU
                                            # host drop this line to use the chip
import numpy as np
import jax.numpy as jnp
"""


def nb_standalone():
    nb = nbf.v4.new_notebook()
    c = nb.cells
    c.append(nbf.v4.new_markdown_cell(
        "# Standalone PV-DER simulation\n\n"
        "The non-RL validation workflow (reference analog: the upstream demo "
        "notebooks driving `DynamicSimulation` + `SimulationEvents` + "
        "`SimulationResults`, SURVEY.md §3.4): script a scenario of solar / "
        "grid / load events, integrate the full inverter ODE over the "
        "horizon, and plot the collected trajectory series.\n\n"
        "Everything below runs through the public `pvderx` API on CPU; on a "
        "TPU host the same code runs the batched Pallas path."))
    c.append(nbf.v4.new_code_cell(SETUP))
    c.append(nbf.v4.new_markdown_cell(
        "## Script a scenario\n\n"
        "Events mirror the reference's `add_solar_event / add_grid_event / "
        "add_load_event` surface. Grid events take optional negative-sequence "
        "components `(v2, phi2)` for unbalanced (SLG/LL-type) sags — "
        "three-phase models only."))
    c.append(nbf.v4.new_code_cell(
        "from pvderx.scenario.events import EventBuilder\n"
        "\n"
        "ev = EventBuilder()\n"
        "ev.add_grid_event(2.0, v=0.6)            # balanced 0.6 pu sag ...\n"
        "ev.add_grid_event(2.5, v=1.0)            # ... cleared after 0.5 s\n"
        "ev.add_solar_event(4.0, 400.0)           # cloud: insolation 1000 -> 400 W/m^2\n"
        "ev.add_solar_event(6.0, 1000.0)          # cloud passes\n"
        "ev.add_grid_event(8.0, v=0.7, v2=0.15, phi2=0.5)  # unbalanced sag\n"
        "ev.add_grid_event(8.3, v=1.0)\n"
        "ev.add_load_event(10.0, g_load=0.3)      # local load step\n"))
    c.append(nbf.v4.new_markdown_cell(
        "## Run the simulation\n\n"
        "`DynamicSimulation` mirrors the reference class surface: "
        "`run_simulation()` integrates window-by-window (1/60 s control "
        "windows, RK4 substeps, supervisory layer between windows) and "
        "collects the trajectory series, accessible as `sim.t_t`, "
        "`sim.vdc_t`, `sim.p_pcc_t`, ... like the reference's `t_t, Vdc_t, "
        "...` accessors."))
    c.append(nbf.v4.new_code_cell(
        "from pvderx.sim import DynamicSimulation\n"
        "\n"
        "sim = DynamicSimulation(\"50\", events=ev, tStop=12.0)  # 50 kW three-phase\n"
        "series = sim.run_simulation()\n"
        "print(sorted(series.keys()))\n"
        "print(f\"steps={len(sim.t_t)}  Vdc in [{sim.vdc_t.min():.4f}, \"\n"
        "      f\"{sim.vdc_t.max():.4f}] pu  tripped={bool(sim.tripped_t[-1])}\")\n"))
    c.append(nbf.v4.new_code_cell("sim.show_PV_DER_states()\n"))
    c.append(nbf.v4.new_markdown_cell(
        "## Plot the reference plot set\n\n"
        "`SimulationResults.plot_DER_simulation` reproduces the reference's "
        "plot types (`power`, `voltage`, `current`, `duty_cycle`, "
        "`frequency`, `dc`, or `all`)."))
    c.append(nbf.v4.new_code_cell(
        "from IPython.display import Image, display\n"
        "from pvderx.diag.plots import SimulationResults\n"
        "\n"
        "res = SimulationResults(series, title=\"50 kW three-phase, eventful scenario\")\n"
        "path = res.plot_DER_simulation(\"all\", save_path=\"/tmp/pvderx_nb_all.png\")\n"
        "display(Image(path))\n"))
    c.append(nbf.v4.new_markdown_cell(
        "The sag at t=2 s dips the PCC voltage and power; the cloud between "
        "4–6 s cuts PV power to ~40%; the unbalanced sag at t=8 s shows up as "
        "a voltage/power dip with a nonzero negative-sequence component; the "
        "load step at t=10 s shifts the PCC operating point. The DC link "
        "stays regulated at 1 pu throughout — the reference behavior this "
        "framework reproduces to ≤1e-6 against its scipy/LSODA oracle "
        "(`tests/test_trajectory.py`)."))
    return nb


def nb_train():
    nb = nbf.v4.new_notebook()
    c = nb.cells
    c.append(nbf.v4.new_markdown_cell(
        "# Training RL agents on the PV-DER environment\n\n"
        "The reference demos train stable-baselines DQN/PPO against "
        "`gym.make('PVDER-v0')` one env-step at a time. pvderx keeps that "
        "single-env Gymnasium surface (below) and adds the TPU-native path: "
        "thousands of vectorized envs stepped inside one jitted train_step "
        "(SURVEY.md §2.5). This notebook shows both, sized to run on CPU in "
        "a couple of minutes."))
    c.append(nbf.v4.new_code_cell(SETUP))
    c.append(nbf.v4.new_markdown_cell(
        "## Gymnasium single-env rollout (reference-style)"))
    c.append(nbf.v4.new_code_cell(
        "import gymnasium as gym\n"
        "from pvderx.env.gym_adapter import register_envs\n"
        "register_envs()\n"
        "\n"
        "env = gym.make(\"pvderx/PVDER-v0\", n_sub=40, horizon=120)\n"
        "obs, _ = env.reset(seed=0)\n"
        "ret = 0.0\n"
        "for k in range(120):\n"
        "    obs, r, term, trunc, info = env.step(env.action_space.sample())\n"
        "    ret += r\n"
        "    if k % 30 == 0:\n"
        "        print(env.unwrapped.render())\n"
        "    if term or trunc:\n"
        "        break\n"
        "print(f\"random-policy return: {ret:.2f}\")\n"))
    c.append(nbf.v4.new_markdown_cell(
        "## Batched DQN (the reference's DQN demo, TPU-scaled)\n\n"
        "One jitted `train_step` = epsilon-greedy collection over all envs + "
        "replay writes + double-DQN updates. On a TPU pod slice the same "
        "runner shards over the mesh 'env' axis (`pvderx.dist.shard_runner`)."))
    c.append(nbf.v4.new_code_cell(
        "from pvderx.env import make_env_config\n"
        "from pvderx.learn import DQNConfig, make_dqn\n"
        "\n"
        "cfg = make_env_config(\"10\", n_sub=40, horizon=120)\n"
        "dqn = DQNConfig(rollout_len=4, n_updates=4, batch_size=128,\n"
        "                capacity=16384, eps_decay_updates=40)\n"
        "init_runner, train_step, _ = make_dqn(cfg, dqn)\n"
        "runner = init_runner(jax.random.PRNGKey(0), 64)\n"
        "ts = jax.jit(train_step, donate_argnums=(0,))\n"
        "\n"
        "hist = []\n"
        "for i in range(60):\n"
        "    runner, m = ts(runner)\n"
        "    hist.append(float(m[\"reward_mean\"]))\n"
        "    if i % 15 == 0 or i == 59:\n"
        "        print(f\"update {i:3d}: reward={hist[-1]:+.3f} \"\n"
        "              f\"eps={float(m['epsilon']):.2f} loss={float(m['loss']):.4f}\")\n"))
    c.append(nbf.v4.new_code_cell(
        "import matplotlib\n"
        "matplotlib.use(\"Agg\")\n"
        "import matplotlib.pyplot as plt\n"
        "from IPython.display import Image, display\n"
        "\n"
        "fig, ax = plt.subplots(figsize=(7, 3.2))\n"
        "w = 5  # smooth over a 5-update window\n"
        "sm = np.convolve(hist, np.ones(w) / w, mode=\"valid\")\n"
        "ax.plot(np.arange(len(sm)) + w - 1, sm, lw=2, color=\"#2f6f9f\")\n"
        "ax.set_xlabel(\"train_step\")\n"
        "ax.set_ylabel(\"mean per-step reward\")\n"
        "ax.set_title(\"DQN on pvderx/PVDER-v0 (64 envs, CPU demo)\")\n"
        "ax.grid(True, alpha=0.3)\n"
        "fig.savefig(\"/tmp/pvderx_nb_dqn.png\", dpi=120, bbox_inches=\"tight\")\n"
        "plt.close(fig)\n"
        "display(Image(\"/tmp/pvderx_nb_dqn.png\"))\n"))
    c.append(nbf.v4.new_markdown_cell(
        "## PPO (the reference's PPO demo) — and proof that it LEARNS\n\n"
        "Same design: rollout scan + GAE + minibatched clipped-PPO epochs in "
        "one XLA program. Here on the BASELINE config-3 task (anomaly "
        "detection under frequent sags): the agent earns +0.5 for flagging "
        "while an injected event is active, −0.2 for false alarms. A random "
        "policy averages ≈0.064/step; PPO reaches ≈0.099 within 60 updates "
        "— the same seeded gate `tests/test_learning.py` enforces. For "
        "full-scale runs use `examples/train_ppo.py --n-envs 8192` on a TPU "
        "host."))
    c.append(nbf.v4.new_code_cell(
        "from pvderx.env.core import ScenarioConfig\n"
        "from pvderx.learn import PPOConfig, make_ppo\n"
        "from pvderx.learn.env_api import make_env_api\n"
        "\n"
        "cfg3 = make_env_config(\"10\", n_sub=40, horizon=50, anomaly_detect=True,\n"
        "                       scen=ScenarioConfig(p_sag=0.9, p_freq=0.1,\n"
        "                                          sag_depth_lo=0.2, sag_depth_hi=0.85))\n"
        "ppo = PPOConfig(rollout_len=16, n_epochs=2, n_minibatch=4,\n"
        "                lr=3e-3, ent_coef=0.005)\n"
        "init_runner, train_step, _ = make_ppo(cfg3, ppo, hidden=(32, 32))\n"
        "prunner = init_runner(jax.random.PRNGKey(1), 64)\n"
        "pts = jax.jit(train_step, donate_argnums=(0,))\n"
        "ppo_hist = []\n"
        "for i in range(60):\n"
        "    prunner, m = pts(prunner)\n"
        "    ppo_hist.append(float(m[\"reward_mean\"]))\n"
        "    if i % 15 == 0 or i == 59:\n"
        "        print(f\"update {i:2d}: reward={ppo_hist[-1]:+.4f} \"\n"
        "              f\"loss={float(m['loss']):.4f} entropy={float(m['entropy']):.3f}\")\n"
        "\n"
        "# random-policy baseline on the same env\n"
        "api = make_env_api(cfg3)\n"
        "st, ob = api.reset_batch(jax.random.PRNGKey(2), 64)\n"
        "stp = jax.jit(api.step)\n"
        "key, tot = jax.random.PRNGKey(3), []\n"
        "for _ in range(320):\n"
        "    key, k = jax.random.split(key)\n"
        "    st, ob, r, d, _ = stp(st, jax.random.randint(k, (64,), 0, api.n_actions))\n"
        "    tot.append(float(r.mean()))\n"
        "rand_ret = float(np.mean(tot))\n"
        "print(f\"random policy: {rand_ret:+.4f}   PPO (last 10): \"\n"
        "      f\"{float(np.mean(ppo_hist[-10:])):+.4f}\")\n"))
    c.append(nbf.v4.new_code_cell(
        "fig, ax = plt.subplots(figsize=(7, 3.2))\n"
        "sm = np.convolve(ppo_hist, np.ones(5) / 5, mode=\"valid\")\n"
        "ax.plot(np.arange(len(sm)) + 4, sm, lw=2, color=\"#2f6f9f\",\n"
        "        label=\"PPO (5-update smoothed)\")\n"
        "ax.axhline(rand_ret, color=\"#b0413e\", ls=\"--\", lw=1.5,\n"
        "           label=f\"random policy ({rand_ret:+.3f})\")\n"
        "ax.set_xlabel(\"train_step\")\n"
        "ax.set_ylabel(\"mean per-step reward\")\n"
        "ax.set_title(\"PPO learns anomaly flagging (BASELINE config 3, CPU demo)\")\n"
        "ax.legend(loc=\"lower right\")\n"
        "ax.grid(True, alpha=0.3)\n"
        "fig.savefig(\"/tmp/pvderx_nb_ppo.png\", dpi=120, bbox_inches=\"tight\")\n"
        "plt.close(fig)\n"
        "display(Image(\"/tmp/pvderx_nb_ppo.png\"))\n"))
    c.append(nbf.v4.new_markdown_cell(
        "## SAC (continuous extension) — the same learning proof\n\n"
        "The continuous Box(2) action space (per-step `(dq, dv)` deltas) "
        "trains with SAC. On a high-authority variant (dq=0.15/dv=0.06 per "
        "step) a uniform-random policy damages its own setpoint tracking "
        "(≈0.054/step) while 300 seeded SAC updates reach ≈0.085 — the "
        "pinned margin gate is `tests/test_learning.py::"
        "test_sac_learns_better_than_random` (round 5: margin 0.031 "
        "observed, 0.015 pinned)."))
    c.append(nbf.v4.new_code_cell(
        "from pvderx.learn import SACConfig, make_sac\n"
        "\n"
        "cfg_c = make_env_config(\"10\", n_sub=40, horizon=50, continuous=True,\n"
        "                       dq_action=0.15, dv_action=0.06)\n"
        "init_runner, sac_step, _ = make_sac(cfg_c, SACConfig(lr=3e-3, init_alpha=0.05),\n"
        "                                    hidden=(32, 32))\n"
        "srunner = init_runner(jax.random.PRNGKey(0), 64)\n"
        "sts = jax.jit(sac_step, donate_argnums=(0,))\n"
        "sac_hist = []\n"
        "for i in range(300):\n"
        "    srunner, m = sts(srunner)\n"
        "    sac_hist.append(float(m[\"reward_mean\"]))\n"
        "\n"
        "api_c = make_env_api(cfg_c)\n"
        "st, ob = api_c.reset_batch(jax.random.PRNGKey(7), 64)\n"
        "stp = jax.jit(api_c.step)\n"
        "key, tot = jax.random.PRNGKey(7 + 999), []\n"
        "for _ in range(320):\n"
        "    key, k = jax.random.split(key)\n"
        "    a = jax.random.uniform(k, (64, api_c.act_dim), minval=-1.0, maxval=1.0)\n"
        "    st, ob, r, d, _ = stp(st, a)\n"
        "    tot.append(float(r.mean()))\n"
        "sac_rand = float(np.mean(tot))\n"
        "print(f\"random: {sac_rand:+.4f}   SAC (last 20): \"\n"
        "      f\"{float(np.mean(sac_hist[-20:])):+.4f}\")\n"))
    c.append(nbf.v4.new_code_cell(
        "fig, ax = plt.subplots(figsize=(7, 3.2))\n"
        "sm = np.convolve(sac_hist, np.ones(15) / 15, mode=\"valid\")\n"
        "ax.plot(np.arange(len(sm)) + 14, sm, lw=2, color=\"#2f6f9f\",\n"
        "        label=\"SAC (15-update smoothed)\")\n"
        "ax.axhline(sac_rand, color=\"#b0413e\", ls=\"--\", lw=1.5,\n"
        "           label=f\"random policy ({sac_rand:+.3f})\")\n"
        "ax.set_xlabel(\"train_step\")\n"
        "ax.set_ylabel(\"mean per-step reward\")\n"
        "ax.set_title(\"SAC learns continuous setpoint control (high-authority variant)\")\n"
        "ax.legend(loc=\"lower right\")\n"
        "ax.grid(True, alpha=0.3)\n"
        "fig.savefig(\"/tmp/pvderx_nb_sac.png\", dpi=120, bbox_inches=\"tight\")\n"
        "plt.close(fig)\n"
        "display(Image(\"/tmp/pvderx_nb_sac.png\"))\n"))
    c.append(nbf.v4.new_markdown_cell(
        "## Deploying the trained policy\n\n"
        "Controllers ultimately run on hosts without JAX (inverter "
        "controllers, EMS/SCADA). `pvderx.learn.export` flattens the trained "
        "Flax MLP into a numpy-only forward plus a portable JSON artifact, "
        "exact to the Flax output (tests/test_export.py)."))
    c.append(nbf.v4.new_code_cell(
        "from pvderx.learn import NumpyMLPPolicy, export_actor_critic\n"
        "\n"
        "pol = export_actor_critic(prunner.params)\n"
        "artifact = pol.to_json()                    # ship this file\n"
        "pol2 = NumpyMLPPolicy.from_json(artifact)   # ... on the target host\n"
        "obs_np = np.asarray(prunner.obs)\n"
        "print(\"artifact size:\", len(artifact) // 1024, \"KiB\")\n"
        "print(\"deployed actions:\", pol2.act(obs_np)[:10])\n"))
    c.append(nbf.v4.new_markdown_cell(
        "Both learners are checkpointable pytrees (`pvderx.diag.checkpoint`) "
        "and shard unchanged over multi-host TPU meshes — see "
        "`tests/test_dist.py` and `examples/train_*.py`."))
    return nb


def main():
    jobs = [
        ("standalone_simulation.ipynb", nb_standalone()),
        ("train_rl.ipynb", nb_train()),
    ]
    for name, nb in jobs:
        path = os.path.join(HERE, name)
        client = NotebookClient(nb, timeout=1200, kernel_name="python3",
                                resources={"metadata": {"path": HERE}})
        client.execute()
        nbf.write(nb, path)
        print("wrote", path)


if __name__ == "__main__":
    sys.exit(main())
