"""Gymnasium single-env rollout — the reference's gym.make('PVDER-v0') flow.

Reference analog (SURVEY.md §3.1-3.3): make the env, reset, random actions.

    python examples/gym_rollout.py [--steps 120] [--continuous]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import gymnasium as gym

    import pvderx.env.gym_adapter  # noqa: F401  (registers pvderx/PVDER-v0)

    env = gym.make("pvderx/PVDER-v0", continuous=args.continuous)
    obs, info = env.reset(seed=0)
    total = 0.0
    for k in range(args.steps):
        action = env.action_space.sample()
        obs, reward, terminated, truncated, info = env.step(action)
        total += reward
        if k % 30 == 0:
            print(env.unwrapped.render())
        if terminated or truncated:
            print(f"episode end at step {k} (terminated={terminated})")
            obs, info = env.reset()
    print(f"return over {args.steps} steps: {total:.2f}")


if __name__ == "__main__":
    main()
