"""pvderx — TPU-native PV-DER RL environment engine (see SPEC.md, SURVEY.md)."""
from pvderx.params import DERParams, Exog, make_params, nominal_exog, PRESETS

__version__ = "0.1.0"

__all__ = ["DERParams", "Exog", "make_params", "nominal_exog", "PRESETS", "__version__"]
