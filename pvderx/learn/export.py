"""Trained-policy export for deployment — a dependency-free inference path.

A controller trained with `pvderx.learn` ultimately runs inside a real
inverter controller or a SCADA/EMS host, where JAX is not a deployable
dependency. This module flattens the Flax MLP params into plain numpy
arrays and evaluates the policy with numpy only, plus a JSON round-trip so
the exported artifact is portable (and diffable) across hosts.

The export is exact: the numpy forward reproduces `net.apply` to float32
roundoff (pinned in tests/test_export.py). Works for the three learner
families: ActorCritic (PPO, greedy action = argmax logits), QNetwork (DQN,
greedy action = argmax Q), TanhGaussianActor (SAC, deterministic action =
tanh(mu)).
"""
from __future__ import annotations

import json

import numpy as np

_ACTIVATIONS = {"tanh": np.tanh, "relu": lambda x: np.maximum(x, 0.0)}


class NumpyMLPPolicy:
    """Stacked Dense trunk + one or more linear heads, numpy-only."""

    def __init__(self, trunk, heads, activation: str):
        self.trunk = [(np.asarray(k, np.float32), np.asarray(b, np.float32))
                      for k, b in trunk]
        self.heads = {name: (np.asarray(k, np.float32), np.asarray(b, np.float32))
                      for name, (k, b) in heads.items()}
        self.activation = activation
        self._act = _ACTIVATIONS[activation]

    def features(self, obs: np.ndarray) -> np.ndarray:
        h = np.asarray(obs, np.float32)
        for k, b in self.trunk:
            h = self._act(h @ k + b)
        return h

    def head(self, name: str, obs: np.ndarray) -> np.ndarray:
        k, b = self.heads[name]
        return self.features(obs) @ k + b

    def act(self, obs: np.ndarray) -> np.ndarray:
        """Deterministic action: argmax over the discrete head, or tanh(mu)
        for the continuous head."""
        if "logits" in self.heads:
            return np.argmax(self.head("logits", obs), axis=-1)
        if "q" in self.heads:
            return np.argmax(self.head("q", obs), axis=-1)
        return np.tanh(self.head("mu", obs))

    # ---- portable JSON artifact -------------------------------------------
    def to_json(self) -> str:
        return json.dumps({
            "activation": self.activation,
            "trunk": [[k.tolist(), b.tolist()] for k, b in self.trunk],
            "heads": {n: [k.tolist(), b.tolist()]
                      for n, (k, b) in self.heads.items()},
        })

    @classmethod
    def from_json(cls, s: str) -> "NumpyMLPPolicy":
        d = json.loads(s)
        return cls([(np.asarray(k), np.asarray(b)) for k, b in d["trunk"]],
                   {n: (np.asarray(kb[0]), np.asarray(kb[1]))
                    for n, kb in d["heads"].items()},
                   d["activation"])


def _dense_layers(params: dict):
    """Flax params dict -> [(kernel, bias)] in Dense_0..Dense_n order."""
    p = params["params"] if "params" in params else params
    idx = sorted(int(k.split("_")[1]) for k in p if k.startswith("Dense_"))
    return [(np.asarray(p[f"Dense_{i}"]["kernel"]),
             np.asarray(p[f"Dense_{i}"]["bias"])) for i in idx]


def export_actor_critic(params: dict, n_hidden: int = 2) -> NumpyMLPPolicy:
    """PPO ActorCritic -> numpy policy (heads: logits, value)."""
    layers = _dense_layers(params)
    trunk, (lk, lb), (vk, vb) = layers[:n_hidden], layers[-2], layers[-1]
    return NumpyMLPPolicy(trunk, {"logits": (lk, lb), "value": (vk, vb)},
                          "tanh")


def export_qnetwork(params: dict, n_hidden: int = 2) -> NumpyMLPPolicy:
    """DQN QNetwork -> numpy policy (head: q)."""
    layers = _dense_layers(params)
    return NumpyMLPPolicy(layers[:n_hidden], {"q": layers[-1]}, "relu")


def export_tanh_gaussian(params: dict, n_hidden: int = 2) -> NumpyMLPPolicy:
    """SAC TanhGaussianActor -> numpy policy (heads: mu, log_std);
    act() returns the deterministic tanh(mu) action."""
    layers = _dense_layers(params)
    return NumpyMLPPolicy(layers[:n_hidden],
                          {"mu": layers[-2], "log_std": layers[-1]}, "relu")
