"""Numpy policy export (pvderx/learn/export.py): the dependency-free
deployment path must reproduce the Flax forward exactly and round-trip
through the JSON artifact."""
import jax
import jax.numpy as jnp
import numpy as np

from pvderx.learn.export import (
    NumpyMLPPolicy, export_actor_critic, export_qnetwork,
    export_tanh_gaussian)
from pvderx.learn.nets import ActorCritic, QNetwork, TanhGaussianActor

OBS = 13


def _obs_batch(n=32, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), (n, OBS), jnp.float32)


def test_actor_critic_export_matches_flax():
    net = ActorCritic(n_actions=5)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((1, OBS)))
    pol = export_actor_critic(params)
    obs = _obs_batch()
    logits_f, value_f = net.apply(params, obs)
    np.testing.assert_allclose(pol.head("logits", np.asarray(obs)),
                               np.asarray(logits_f), rtol=0, atol=1e-5)
    np.testing.assert_allclose(pol.head("value", np.asarray(obs))[:, 0],
                               np.asarray(value_f), rtol=0, atol=1e-5)
    np.testing.assert_array_equal(pol.act(np.asarray(obs)),
                                  np.argmax(np.asarray(logits_f), -1))


def test_qnetwork_export_matches_flax():
    net = QNetwork(n_actions=6)
    params = net.init(jax.random.PRNGKey(2), jnp.zeros((1, OBS)))
    pol = export_qnetwork(params)
    obs = _obs_batch(key=3)
    q_f = np.asarray(net.apply(params, obs))
    np.testing.assert_allclose(pol.head("q", np.asarray(obs)), q_f,
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(pol.act(np.asarray(obs)), np.argmax(q_f, -1))


def test_tanh_gaussian_export_matches_flax():
    net = TanhGaussianActor(act_dim=2)
    params = net.init(jax.random.PRNGKey(4), jnp.zeros((1, OBS)))
    pol = export_tanh_gaussian(params)
    obs = _obs_batch(key=5)
    mu_f, _log_std = net.apply(params, obs)
    np.testing.assert_allclose(pol.act(np.asarray(obs)),
                               np.tanh(np.asarray(mu_f)), rtol=0, atol=1e-5)


def test_json_roundtrip_bitwise():
    net = ActorCritic(n_actions=5)
    params = net.init(jax.random.PRNGKey(6), jnp.zeros((1, OBS)))
    pol = export_actor_critic(params)
    pol2 = NumpyMLPPolicy.from_json(pol.to_json())
    obs = np.asarray(_obs_batch(key=7))
    np.testing.assert_array_equal(pol.head("logits", obs),
                                  pol2.head("logits", obs))
    np.testing.assert_array_equal(pol.act(obs), pol2.act(obs))
