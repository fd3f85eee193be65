from pvderx.learn.dqn import DQNConfig, DQNRunner, make_dqn
from pvderx.learn.env_api import EnvAPI, make_env_api
from pvderx.learn.export import (
    NumpyMLPPolicy, export_actor_critic, export_qnetwork,
    export_tanh_gaussian)
from pvderx.learn.nets import ActorCritic, DoubleCritic, QNetwork, TanhGaussianActor
from pvderx.learn.ppo import PPOConfig, make_ppo, PPORunner
from pvderx.learn.sac import SACConfig, SACRunner, make_sac

__all__ = [
    "ActorCritic", "DoubleCritic", "QNetwork", "TanhGaussianActor",
    "DQNConfig", "make_dqn", "DQNRunner",
    "PPOConfig", "make_ppo", "PPORunner",
    "SACConfig", "make_sac", "SACRunner",
    "EnvAPI", "make_env_api",
    "NumpyMLPPolicy", "export_actor_critic", "export_qnetwork",
    "export_tanh_gaussian",
]
