"""DER model selection by type string.

Reference analog: `DER_wrapper.py`, which picks the DER component class from a
model-type string (SURVEY.md §2.1 #7, `[pvder:pvder/DER_wrapper.py]` —
unverified upstream path). In pvderx there is one shared equation core
(`pvderx/physics/rhs_core.py`); a "model" is a `DERParams` configuration:
phase count and rating come from the preset, the constant-Vdc variant is the
branchless `const_vdc` mask (so heterogeneous fleets mixing variants still
batch into one kernel).
"""
from __future__ import annotations

from pvderx.params import DERParams, make_params

# type string -> (default preset, parameter overrides)
DER_MODEL_TYPES = {
    "SolarPVDERSinglePhase": ("10", {}),
    "SolarPVDERThreePhase": ("50", {}),
    "SolarPVDERThreePhaseBalanced": ("50", {}),
    "SolarPVDERThreePhaseConstantVdc": ("50", {"const_vdc": 1.0}),
}


def make_der(der_type: str, preset: str | None = None, **overrides) -> DERParams:
    """Build a `DERParams` from a model-type string (+ optional rating preset).

    >>> p = make_der("SolarPVDERThreePhaseConstantVdc", preset="250")
    >>> p.const_vdc
    1.0
    """
    try:
        default_preset, type_over = DER_MODEL_TYPES[der_type]
    except KeyError:
        raise KeyError(
            f"unknown DER model type {der_type!r}; "
            f"known: {sorted(DER_MODEL_TYPES)}") from None
    kw = dict(type_over)
    kw.update(overrides)
    return make_params(preset or default_preset, **kw)
