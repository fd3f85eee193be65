"""pvderx — TPU-native PV-DER RL environment engine (see SPEC.md, SURVEY.md)."""
from pvderx.params import DERParams, Exog, make_params, nominal_exog, PRESETS
from pvderx.models import DER_MODEL_TYPES, make_der
from pvderx import physics

__version__ = "0.3.0"

# Register the Gymnasium env ids at package import, like the reference's
# `import gym_PVDER` (SURVEY.md §2.1 #1) — but WITHOUT importing the env
# stack: Gymnasium entry points are strings, resolved at gym.make() time, so
# registration only needs gymnasium itself. `import pvderx` stays light for
# physics-only users (the lazy-surface contract below; ADVICE r3).
import importlib.util as _ilu

if _ilu.find_spec("gymnasium") is not None:
    from gymnasium.envs.registration import register as _gym_register
    from gymnasium.envs.registration import registry as _gym_registry

    if "pvderx/PVDER-v0" not in _gym_registry:
        _gym_register(
            id="pvderx/PVDER-v0",
            entry_point="pvderx.env.gym_adapter:PVDEREnv",
            vector_entry_point="pvderx.env.gym_adapter:PVDERVectorEnv")
    if "pvderx/PVDERFleet-v0" not in _gym_registry:
        _gym_register(id="pvderx/PVDERFleet-v0",
                      entry_point="pvderx.env.gym_adapter:PVDERFleetEnv")

# Lazy top-level conveniences (the MIGRATION.md surface) — resolved on first
# access so `import pvderx` stays light for physics-only users.
_LAZY = {
    "check_parameters": ("pvderx.checks", "check_parameters"),
    "check_scenario": ("pvderx.checks", "check_scenario"),
    "creation_message": ("pvderx.checks", "creation_message"),
    "make_env_config": ("pvderx.env", "make_env_config"),
    "EventBuilder": ("pvderx.scenario", "EventBuilder"),
    "DynamicSimulation": ("pvderx.sim", "DynamicSimulation"),
    "SimulationResults": ("pvderx.diag.plots", "SimulationResults"),
}

# submodules resolvable as attributes (`pvderx.env.make_env_config(...)` is
# the documented MIGRATION surface; before registration went string-based,
# the eager gym_adapter import bound pvderx.env as a side effect)
_LAZY_MODULES = ("env", "sim", "scenario", "ode", "physics", "oracle",
                 "learn", "dist", "diag", "utils", "native", "config")


def __getattr__(name):
    import importlib

    if name in _LAZY:
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    if name in _LAZY_MODULES:
        return importlib.import_module(f"pvderx.{name}")
    raise AttributeError(f"module 'pvderx' has no attribute {name!r}")


__all__ = [
    "DERParams", "Exog", "make_params", "nominal_exog", "PRESETS",
    "DER_MODEL_TYPES", "make_der", "physics", "__version__",
    *_LAZY,
]
