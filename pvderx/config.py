"""JSON config store: DER parameter files, scenario files, env configs.

Reference analog: the per-rating parameter dictionaries that later upstream
versions move into JSON config files (SURVEY.md §2.1 #11,
`[pvder:pvder/templates.py]` / config JSONs — unverified upstream paths).
pvderx ships every preset as a JSON file under `pvderx/configs/` and loads
them into the typed frozen dataclasses (DERParams etc.) that the jitted code
consumes — JSON is the at-rest format, pytrees are the runtime format.

Three file kinds:

- DER params:  {"preset": "10", "overrides": {...}}  or  {"fields": {...}}
               (full flat DERParams field map, as written by `save_der`)
- scenario:    {"solar": [[t, S, T], ...],
                "grid": [[t, V, phi, dw, V2, phi2], ...]   (V2/phi2 optional:
                         negative-sequence unbalance, 3-phase models),
                "load": [[t, G, B], ...]}  -> EventBuilder -> EventSchedule
- env config:  kwargs for `make_env_config` (+ optional "scen" ranges and
               "der" block of either DER form above)
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from pvderx.params import DERParams, make_params
from pvderx.scenario.events import EventBuilder

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def _resolve(name_or_path: str, subdir: str = "") -> str:
    """Accept a bare name ('der_10kW'), a packaged file, or a filesystem path."""
    if os.path.exists(name_or_path):
        return name_or_path
    base = name_or_path if name_or_path.endswith(".json") else name_or_path + ".json"
    packaged = os.path.join(CONFIG_DIR, subdir, base)
    if os.path.exists(packaged):
        return packaged
    raise FileNotFoundError(
        f"no config {name_or_path!r} (looked at {packaged!r}); "
        f"packaged: {sorted(os.listdir(os.path.join(CONFIG_DIR, subdir)) if subdir else os.listdir(CONFIG_DIR))}")


def load_der(name_or_path: str, **extra_overrides) -> DERParams:
    """Load a DERParams from a packaged or user JSON file."""
    with open(_resolve(name_or_path)) as f:
        doc = json.load(f)
    if "fields" in doc:
        fields = dict(doc["fields"])
        fields.update(extra_overrides)
        fields["n_ph"] = int(fields["n_ph"])
        return DERParams(**fields)
    over = dict(doc.get("overrides", {}))
    over.update(extra_overrides)
    return make_params(doc["preset"], **over)


def save_der(p: DERParams, path: str) -> str:
    """Write the full flat field map (round-trips through load_der)."""
    fields = {f.name: (int(v) if f.name == "n_ph" else float(np.asarray(v)))
              for f in dataclasses.fields(p)
              for v in [getattr(p, f.name)]}
    with open(path, "w") as f:
        json.dump({"fields": fields}, f, indent=2, sort_keys=True)
    return path


def load_scenario(name_or_path: str, dtype=np.float32,
                  k_solar: int = 8, k_grid: int = 8, k_load: int = 4):
    """Load an event schedule from JSON (reference analog: scripted
    SimulationEvents, SURVEY.md §3.4). Returns (EventBuilder, EventSchedule)."""
    with open(_resolve(name_or_path, "scenarios")) as f:
        doc = json.load(f)
    ev = EventBuilder()
    for row in doc.get("solar", []):
        if row[0] == 0.0:
            ev._solar = [tuple(map(float, row))]
        else:
            ev.add_solar_event(*row)
    for row in doc.get("grid", []):
        if row[0] == 0.0:
            ev._grid = [tuple(map(float, row))]
        else:
            ev.add_grid_event(row[0], *row[1:])
    for row in doc.get("load", []):
        if row[0] == 0.0:
            ev._load = [tuple(map(float, row))]
        else:
            ev.add_load_event(row[0], *row[1:])
    return ev, ev.build(k_solar=k_solar, k_grid=k_grid, k_load=k_load,
                        dtype=dtype)


def load_env_config(name_or_path: str, dtype=None, **overrides):
    """Build an EnvConfig from an env JSON (see pvderx/configs/env_*.json)."""
    import jax.numpy as jnp

    from pvderx.env import core

    with open(_resolve(name_or_path)) as f:
        doc = json.load(f)
    kw = {k: v for k, v in doc.items() if not k.startswith("_")}
    der_doc = kw.pop("der", None)
    scen_doc = kw.pop("scen", None)
    kw.update(overrides)
    if dtype is not None:
        kw["dtype"] = dtype
    elif "dtype" in kw:
        kw["dtype"] = {"float32": jnp.float32, "float64": jnp.float64}[kw["dtype"]]
    if der_doc is not None:
        if "fields" in der_doc:
            kw["der"] = DERParams(**{**der_doc["fields"],
                                     "n_ph": int(der_doc["fields"]["n_ph"])})
        else:
            kw["der"] = make_params(der_doc["preset"],
                                    **der_doc.get("overrides", {}))
    if scen_doc is not None:
        kw["scen"] = core.ScenarioConfig(**scen_doc)
    return core.make_env_config(**kw)
