"""pvderx — TPU-native PV-DER RL environment engine (see SPEC.md, SURVEY.md)."""
from pvderx.params import DERParams, Exog, make_params, nominal_exog, PRESETS
from pvderx.models import DER_MODEL_TYPES, make_der
from pvderx import physics

__version__ = "0.1.0"

__all__ = [
    "DERParams", "Exog", "make_params", "nominal_exog", "PRESETS",
    "DER_MODEL_TYPES", "make_der", "physics", "__version__",
]
