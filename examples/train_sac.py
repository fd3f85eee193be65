"""SAC training on the continuous-action env (pvderx extension; SURVEY.md §7).

    python examples/train_sac.py --n-envs 256 --updates 50
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="10")
    ap.add_argument("--n-envs", type=int, default=256)
    ap.add_argument("--updates", type=int, default=50)
    ap.add_argument("--n-sub", type=int, default=None,
                    help="RK4 substeps/window; default = the per-preset 1e-6 knee (72 single-phase, 88 three-phase; SPEC §6)")
    ap.add_argument("--metrics", default="/tmp/pvderx_sac_metrics.jsonl")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    args.n_sub = args.n_sub or (72 if args.preset == "10" else 88)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pvderx.diag import MetricsLogger
    from pvderx.env import make_env_config
    from pvderx.learn import SACConfig, make_sac
    from pvderx.utils import get_logger

    log = get_logger("examples.sac")
    cfg = make_env_config(args.preset, n_sub=args.n_sub, continuous=True)
    sac = SACConfig()
    init_runner, train_step, _ = make_sac(cfg, sac)
    runner = init_runner(jax.random.PRNGKey(0), args.n_envs)
    ts = jax.jit(train_step, donate_argnums=(0,))

    ml = MetricsLogger(args.metrics)
    t0 = time.perf_counter()
    for i in range(args.updates):
        runner, metrics = ts(runner)
        if i % 10 == 0 or i == args.updates - 1:
            float(metrics["critic_loss"])  # scalar fetch: the only real barrier
            rate = (args.n_envs * sac.rollout_len * (i + 1)
                    / (time.perf_counter() - t0))
            log.info("update %d: critic=%.4f reward=%.3f alpha=%.3f "
                     "(%.0f env-steps/s)", i, float(metrics["critic_loss"]),
                     float(metrics["reward_mean"]), float(metrics["alpha"]),
                     rate)
        ml.write(i, metrics)
    ml.close()


if __name__ == "__main__":
    main()
