"""PPO training on the batched TPU env — the reference notebooks' RL flow,
TPU-scaled (SURVEY.md §2.1 #13; §2.5 DP-over-envs design).

    python examples/train_ppo.py --n-envs 1024 --updates 50
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="10")
    ap.add_argument("--n-envs", type=int, default=1024)
    ap.add_argument("--updates", type=int, default=50)
    ap.add_argument("--n-sub", type=int, default=None,
                    help="RK4 substeps/window; default = the per-preset 1e-6 knee (72 single-phase, 88 three-phase; SPEC §6)")
    ap.add_argument("--voltvar", action="store_true", help="BASELINE config 2")
    ap.add_argument("--fleet-m", type=int, default=0,
                    help="train on the M-DER shared-feeder fleet env "
                         "(BASELINE config 5); 0 = single-DER env")
    ap.add_argument("--per-unit", action="store_true",
                    help="fleet mode with per-unit control: MultiDiscrete "
                         "actions (one Discrete(5) per inverter) + the "
                         "per-unit [Vdc|P|Q|conn] obs block; PPO grows a "
                         "factored per-unit policy head (needs --fleet-m)")
    ap.add_argument("--tp", type=int, default=1,
                    help="model-axis size for optional tensor parallelism "
                         "(2-D (env, model) mesh, pvderx.dist.tp; needs "
                         "device_count %% tp == 0). Default 1 = DP only.")
    ap.add_argument("--ckpt", default="", help="checkpoint dir (optional)")
    ap.add_argument("--metrics", default="/tmp/pvderx_ppo_metrics.jsonl")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    args.n_sub = args.n_sub or (72 if args.preset == "10" else 88)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pvderx.diag import MetricsLogger
    from pvderx.diag.checkpoint import save
    from pvderx.dist import make_mesh, shard_runner
    from pvderx.env import make_env_config
    from pvderx.learn import PPOConfig, make_ppo
    from pvderx.utils import get_logger

    log = get_logger("examples.ppo")
    if args.fleet_m:
        from pvderx.env.fleet import make_fleet_config
        cfg = make_fleet_config(args.preset, m=args.fleet_m, n_sub=args.n_sub,
                                per_unit=args.per_unit,
                                voltvar_enable=args.voltvar)
    else:
        if args.per_unit:
            raise SystemExit("--per-unit needs --fleet-m")
        cfg = make_env_config(args.preset, n_sub=args.n_sub,
                              voltvar_enable=args.voltvar)
    init_runner, train_step, _ = make_ppo(cfg, PPOConfig())
    runner = init_runner(jax.random.PRNGKey(0), args.n_envs)
    if args.tp > 1:
        from pvderx.dist import make_mesh_2d, shard_runner_tp
        if jax.device_count() % args.tp:
            raise SystemExit(
                f"--tp {args.tp} does not divide device_count="
                f"{jax.device_count()}")
        mesh2 = make_mesh_2d(jax.device_count() // args.tp, args.tp)
        runner = shard_runner_tp(runner, mesh2)
        log.info("2-D (env=%d, model=%d) mesh: env batch DP-sharded, "
                 "learner MLP tensor-parallel", *mesh2.devices.shape)
    elif jax.device_count() > 1:
        runner = shard_runner(runner, make_mesh())
        log.info("sharded over %d devices", jax.device_count())
    ts = jax.jit(train_step, donate_argnums=(0,))

    ml = MetricsLogger(args.metrics)
    t0 = time.perf_counter()
    for i in range(args.updates):
        runner, metrics = ts(runner)
        if i % 10 == 0 or i == args.updates - 1:
            float(metrics["loss"])  # scalar fetch: the only real barrier (bench.py)
            rate = (args.n_envs * PPOConfig().rollout_len * (i + 1)
                    / (time.perf_counter() - t0))
            log.info("update %d: loss=%.4f reward=%.3f (%.0f env-steps/s)",
                     i, float(metrics["loss"]),
                     float(metrics["reward_mean"]), rate)
        ml.write(i, metrics)
    ml.close()
    if args.ckpt:
        log.info("checkpoint -> %s", save(args.ckpt, runner))


if __name__ == "__main__":
    main()
