from pvderx.env.core import (
    EnvConfig, EnvState, ScenarioConfig, make_env_config,
    reset, step, step_autoreset, OBS_DIM, N_ACTIONS,
)

__all__ = [
    "EnvConfig", "EnvState", "ScenarioConfig", "make_env_config",
    "reset", "step", "step_autoreset", "OBS_DIM", "N_ACTIONS",
]


def __getattr__(name):
    """Lazy submodule access (`pvderx.env.vector`, `.fleet`, `.gym_adapter` —
    the MIGRATION.md surface) without importing them eagerly."""
    if name in ("vector", "fleet", "gym_adapter", "core"):
        import importlib

        return importlib.import_module(f"pvderx.env.{name}")
    raise AttributeError(f"module 'pvderx.env' has no attribute {name!r}")
