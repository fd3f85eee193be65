from pvderx.learn.nets import ActorCritic, DoubleCritic, TanhGaussianActor
from pvderx.learn.ppo import PPOConfig, make_ppo, PPORunner
from pvderx.learn.sac import SACConfig, SACRunner, make_sac

__all__ = [
    "ActorCritic", "DoubleCritic", "TanhGaussianActor",
    "PPOConfig", "make_ppo", "PPORunner",
    "SACConfig", "make_sac", "SACRunner",
]
