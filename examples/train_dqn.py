"""DQN training on the batched TPU env — the reference notebooks' DQN flow,
TPU-scaled (SURVEY.md §2.1 #13; §2.5 DP-over-envs design).

    python examples/train_dqn.py --n-envs 1024 --updates 50
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
    ap.add_argument("--anomaly", action="store_true", help="BASELINE config 3")
    ap.add_argument("--ckpt", default="", help="checkpoint dir (optional)")
    ap.add_argument("--metrics", default="/tmp/pvderx_dqn_metrics.jsonl")
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
    from pvderx.learn import DQNConfig, make_dqn
    from pvderx.utils import get_logger

    log = get_logger("examples.dqn")
    cfg = make_env_config(args.preset, n_sub=args.n_sub,
                          anomaly_detect=args.anomaly)
    dqn = DQNConfig()
    init_runner, train_step, _ = make_dqn(cfg, dqn)
    runner = init_runner(jax.random.PRNGKey(0), args.n_envs)
    if jax.device_count() > 1:
        runner = shard_runner(runner, make_mesh())
        log.info("sharded over %d devices", jax.device_count())
    ts = jax.jit(train_step, donate_argnums=(0,))

    ml = MetricsLogger(args.metrics)
    t0 = time.perf_counter()
    for i in range(args.updates):
        runner, metrics = ts(runner)
        if i % 10 == 0 or i == args.updates - 1:
            float(metrics["loss"])  # scalar fetch: the only real barrier (bench.py)
            rate = (args.n_envs * dqn.rollout_len * (i + 1)
                    / (time.perf_counter() - t0))
            log.info("update %d: loss=%.4f eps=%.2f reward=%.3f (%.0f env-steps/s)",
                     i, float(metrics["loss"]), float(metrics["epsilon"]),
                     float(metrics["reward_mean"]), rate)
        ml.write(i, metrics)
    ml.close()
    if args.ckpt:
        log.info("checkpoint -> %s", save(args.ckpt, runner))


if __name__ == "__main__":
    main()
