"""Optional tensor parallelism for the learner networks (off by default).

SURVEY.md §2.5 TP row: "for the PPO/SAC learner's MLP nets: optional sharding
of wide layers via pjit partition rules; at these model sizes usually
unnecessary — supported via the same mesh, off by default". This module makes
that support concrete:

- a 2-D ``('env', 'model')`` mesh (`make_mesh_2d`);
- Megatron-style partition specs for Flax ``Dense`` stacks
  (`param_partition_specs`): alternating column-parallel
  (kernel ``P(None, 'model')``, bias ``P('model')``) and row-parallel
  (kernel ``P('model', None)``, bias replicated) hidden layers, so the
  activation between a column/row pair stays model-sharded and GSPMD's only
  collective per pair is the row-layer output ``psum`` over ICI. Output heads
  (and any dim not divisible by the model-axis size) replicate.
- runner placement (`shard_runner_tp`): env-batch pytrees sharded on 'env'
  (replicated over 'model'), params TP-sharded, optimizer state placed
  VALUE-PRESERVING by `_place_opt_state` — any optax subtree with the
  params' structure (Adam mu/nu) gets the params' TP specs leaf-for-leaf, so
  a checkpoint-restored runner keeps its moments. (Re-initializing the
  optimizer under jit does not work as a sharding template; see
  `_place_opt_state`.)

Numerics are unchanged: a (env x model) 2-D run reproduces the 1-D env-only
run (tests/test_tp.py). The reference has no analog — it is single-process
with no learner at all (SURVEY.md §2.5).
"""
from __future__ import annotations

import dataclasses
import re

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pvderx.dist.mesh import ENV_AXIS

MODEL_AXIS = "model"


def make_mesh_2d(n_env: int, n_model: int, devices=None) -> Mesh:
    """2-D mesh: DP over environments x TP over learner-layer shards."""
    if devices is None:
        devices = jax.devices()
    need = n_env * n_model
    if len(devices) < need:
        raise ValueError(f"need {need} devices for a {n_env}x{n_model} mesh, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_env, n_model)
    return Mesh(arr, (ENV_AXIS, MODEL_AXIS))


def _layer_index(path) -> int | None:
    """Flax module index from a param path ('Dense_3' -> 3)."""
    for k in reversed(path):
        name = getattr(k, "key", None)
        if isinstance(name, str):
            m = re.fullmatch(r".*_(\d+)", name)
            if m:
                return int(m.group(1))
    return None


def param_partition_specs(params, n_model: int):
    """PartitionSpec pytree for a Flax MLP param tree (Megatron alternation).

    Rules per Dense layer i with kernel [d_in, d_out]:
      - even i and d_out % n_model == 0:  column-parallel
        (kernel P(None, 'model'), bias P('model'))
      - odd i and d_in % n_model == 0:    row-parallel
        (kernel P('model', None), bias P())
      - otherwise (output heads, odd widths): replicated P().
    """

    def spec(path, leaf):
        i = _layer_index(path)
        if i is None or leaf.ndim == 0:
            return P()
        if leaf.ndim == 1:  # bias
            if i % 2 == 0 and leaf.shape[0] % n_model == 0 and leaf.shape[0] >= n_model * 8:
                return P(MODEL_AXIS)
            return P()
        d_in, d_out = leaf.shape[-2], leaf.shape[-1]
        if i % 2 == 0 and d_out % n_model == 0 and d_out >= n_model * 8:
            return P(*(None,) * (leaf.ndim - 1), MODEL_AXIS)
        if i % 2 == 1 and d_in % n_model == 0 and d_in >= n_model * 8:
            return P(*(None,) * (leaf.ndim - 2), MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params, mesh: Mesh):
    """Place a Flax param tree with the TP partition specs over `mesh`."""
    n_model = mesh.shape[MODEL_AXIS]
    specs = param_partition_specs(params, n_model)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def _place_opt_state(opt_state, params, mesh: Mesh):
    """Place an optax state: any subtree with the params' tree structure
    (Adam mu/nu, momentum buffers, …) gets the params' TP specs leaf-for-
    leaf; every other leaf (counts, clip state) replicates. Values are
    preserved — a checkpoint-restored runner keeps its moments. (A jitted
    `optimizer.init(sharded_params)` does NOT work as a sharding template:
    zeros_like outputs are value-independent, so the compiler materializes
    them on the default device.)"""
    n_model = mesh.shape[MODEL_AXIS]
    specs = param_partition_specs(params, n_model)
    p_def = jax.tree_util.tree_structure(params)
    rep = NamedSharding(mesh, P())

    def place(sub):
        if jax.tree_util.tree_structure(sub) == p_def:
            return jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                sub, specs)
        if isinstance(sub, tuple):   # tuple / NamedTuple optax states
            children = [place(c) for c in sub]
            return (type(sub)(*children) if hasattr(sub, "_fields")
                    else tuple(children))
        if isinstance(sub, list):
            return [place(c) for c in sub]
        if isinstance(sub, dict):
            return {k: place(v) for k, v in sub.items()}
        return jax.device_put(sub, rep)

    return place(opt_state)


def shard_runner_tp(runner, mesh: Mesh, *,
                    env_fields=("env_state", "obs", "replay")):
    """Place a learner runner on a 2-D ('env','model') mesh.

    Env-batch fields: axis 0 sharded on 'env' (replicated over 'model').
    Params: TP partition specs. Optimizer state: existing values kept,
    placed via `_place_opt_state`. Everything else replicates.
    """
    from pvderx.dist.sharding import replicate, shard_batch

    params = shard_params_tp(runner.params, mesh)
    opt_state = _place_opt_state(runner.opt_state, runner.params, mesh)
    out = {}
    for f in dataclasses.fields(runner):
        v = getattr(runner, f.name)
        if f.name == "params":
            out[f.name] = params
        elif f.name == "opt_state":
            out[f.name] = opt_state
        elif f.name in env_fields:
            out[f.name] = shard_batch(v, mesh)
        else:
            out[f.name] = replicate(v, mesh)
    return type(runner)(**out)


__all__ = ["MODEL_AXIS", "make_mesh_2d", "param_partition_specs",
           "shard_params_tp", "shard_runner_tp"]
