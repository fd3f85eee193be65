from pvderx.learn.nets import ActorCritic
from pvderx.learn.ppo import PPOConfig, make_ppo, PPORunner

__all__ = ["ActorCritic", "PPOConfig", "make_ppo", "PPORunner"]
