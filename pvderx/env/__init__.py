from pvderx.env.core import (
    EnvConfig, EnvState, ScenarioConfig, make_env_config,
    reset, step, step_autoreset, OBS_DIM, N_ACTIONS,
)

__all__ = [
    "EnvConfig", "EnvState", "ScenarioConfig", "make_env_config",
    "reset", "step", "step_autoreset", "OBS_DIM", "N_ACTIONS",
]
