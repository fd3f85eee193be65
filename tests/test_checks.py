"""Parameter-validation + init-sanity layer (SURVEY.md §2.1 #9).

Reference analog: `check_parameters` / `creation_message` / the fsolve-based
steady-state init sanity in `[pvder:pvder/DER_check_and_initialize.py]`
(unverified upstream path). The property sweeps exercise the *actual
randomized reset space* — including aggressive grid-impedance jitter and
extreme insolation/temperature draws — asserting the Newton init converges
everywhere the env can start an episode.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx import checks
from pvderx.env import core
from pvderx.params import make_params


# ---------------------------------------------------------------------------
# check_parameters
# ---------------------------------------------------------------------------
def test_presets_are_valid():
    for preset in ("10", "50", "250"):
        assert checks.check_parameters(make_params(preset)) == []


@pytest.mark.parametrize("bad", [
    dict(lf=-1.0), dict(rf=0.0), dict(xg=0.0), dict(tau_dc=-0.1),
    dict(gamma=0.0), dict(irs=-1e-9), dict(m_max=0.0), dict(i_max=0.5),
    dict(vdc_floor=1.5), dict(np_par=0.0), dict(const_vdc=0.3),
    dict(ki_gcc=float("nan")),
])
def test_bad_params_raise(bad):
    with pytest.raises(ValueError, match="invalid DERParams"):
        make_params("10", **bad)


def test_inconsistent_rating_raises():
    # s_rated override without matching bases breaks n_ph*v_base*i_base/2
    with pytest.raises(ValueError, match="rating inconsistency"):
        make_params("10", s_rated=20e3)


def test_error_message_lists_all_violations():
    with pytest.raises(ValueError) as ei:
        make_params("10", lf=-1.0, m_max=0.0)
    msg = str(ei.value)
    assert "lf=-1" in msg and "m_max=0" in msg and "problems" in msg


def test_traced_params_are_skipped():
    """Batched/traced leaves must not break validation (device-side checks
    cover them); only host-concrete fields are inspected."""
    p = make_params("10")
    batched = jax.tree.map(lambda v: jnp.full((4,), v), p)
    assert checks.check_parameters(batched) == []  # all leaves skipped

    @jax.jit
    def build(x):
        from pvderx._pytree import replace
        checks.check_parameters(replace(p, rf=x))  # traced leaf -> skipped
        return x

    assert build(jnp.float32(0.015)) == jnp.float32(0.015)


def test_creation_message():
    msg = checks.creation_message(make_params("50"))
    assert "3-phase" in msg and "50 kVA" in msg and "23" in msg
    # batched params -> structural summary, not a TypeError
    batched = jax.tree.map(lambda v: jnp.full((4,), v), make_params("50"))
    assert "batched/traced" in checks.creation_message(batched)
    msg1 = checks.creation_message(make_params("10"))
    assert "1-phase" in msg1 and "10 kVA" in msg1
    msgc = checks.creation_message(make_params("50", const_vdc=1.0))
    assert "constant-Vdc" in msgc


# ---------------------------------------------------------------------------
# check_scenario / make_env_config wiring
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("bad", [
    dict(s0_lo=1000.0, s0_hi=600.0), dict(p_sag=1.2),
    dict(p_sag=0.8, p_freq=0.4), dict(zg_jitter=1.0), dict(s0_lo=0.0),
    dict(sag_depth_lo=0.9, sag_depth_hi=0.3),
])
def test_bad_scenario_raises(bad):
    scen = core.ScenarioConfig(**{
        **dataclasses.asdict(core.ScenarioConfig()), **bad})
    with pytest.raises(ValueError, match="invalid ScenarioConfig"):
        core.make_env_config("10", scen=scen)


def test_make_env_config_validates_der():
    with pytest.raises(ValueError, match="invalid DERParams"):
        core.make_env_config("10", der=make_params("10", validate=False,
                                                   lf=-1.0))


# ---------------------------------------------------------------------------
# init-sanity property sweep over the randomized reset space
# ---------------------------------------------------------------------------
_AGGRESSIVE = core.ScenarioConfig(
    zg_jitter=0.3, p_sag=0.9, p_freq=0.1, sag_depth_lo=0.2, sag_depth_hi=0.85,
    p_cloud=0.9, p_load=0.5, s0_lo=600.0, s0_hi=1000.0,
    tc_lo=293.15, tc_hi=318.15)


@pytest.mark.slow
@pytest.mark.parametrize("preset", ["10", "50", "250"])
def test_randomized_reset_residuals(preset):
    """>=256 randomized resets per preset (incl. zg_jitter=0.3 and the full
    s0/tc0 bands): every episode's Newton init residual <= 1e-6 in f64."""
    cfg = core.make_env_config(preset, dtype=jnp.float64, n_sub=72,
                               scen=_AGGRESSIVE)
    keys = jax.random.split(jax.random.PRNGKey(preset == "50"), 256)
    st, obs = jax.jit(jax.vmap(lambda k: core.reset(cfg, k)))(keys)
    res = np.asarray(st.init_res)
    assert res.shape == (256,)
    assert np.all(np.isfinite(res))
    assert float(res.max()) <= 1e-6, f"worst init residual {res.max():.3e}"
    assert np.all(np.isfinite(np.asarray(obs)))


def test_reset_residual_f32_band():
    """The production f32 path reports a finite, small residual too (roundoff
    floor, not 1e-6 — documented looser band)."""
    cfg = core.make_env_config("10", dtype=jnp.float32, n_sub=72,
                               scen=_AGGRESSIVE)
    keys = jax.random.split(jax.random.PRNGKey(7), 64)
    st, _ = jax.jit(jax.vmap(lambda k: core.reset(cfg, k)))(keys)
    res = np.asarray(st.init_res)
    assert np.all(np.isfinite(res)) and float(res.max()) < 1e-3


def test_fleet_reset_residual():
    from pvderx.env import fleet

    fc = fleet.make_fleet_config(
        "10", m=8, dtype=jnp.float64,
        scen=dataclasses.replace(_AGGRESSIVE, fleet_s_jitter=0.3))
    keys = jax.random.split(jax.random.PRNGKey(3), 16)
    st, _ = jax.jit(jax.vmap(lambda k: fleet.reset(fc, k)))(keys)
    res = np.asarray(st.init_res)
    assert float(res.max()) <= 1e-6, f"worst fleet init residual {res.max():.3e}"


def test_gym_adapter_surfaces_init_res():
    from pvderx.env.gym_adapter import PVDEREnv

    env = PVDEREnv("10", dtype=jnp.float64, scen=_AGGRESSIVE)
    _, info = env.reset(seed=0)
    assert info["init_res"] <= 1e-6

    strict = PVDEREnv("10", dtype=jnp.float64, strict_init=True,
                      init_res_tol=0.0)
    with pytest.raises(RuntimeError, match="steady-state init failed"):
        strict.reset(seed=0)


def test_strict_init_default_tol_is_dtype_aware():
    """ADVICE r3: the default tolerance must accept HEALTHY resets in both
    dtypes — f32 residuals sit in the 2e-5..4e-4 roundoff band, so a single
    f64-grade default would raise on every f32 reset."""
    from pvderx.env.gym_adapter import PVDEREnv

    for dtype, expect_tol in ((jnp.float32, 1e-3), (jnp.float64, 1e-6)):
        env = PVDEREnv("10", dtype=dtype, strict_init=True, scen=_AGGRESSIVE)
        assert env.init_res_tol == expect_tol
        for seed in range(4):
            obs, info = env.reset(seed=seed)   # must not raise
            assert np.isfinite(info["init_res"])


def test_config_leaves_are_host_arrays():
    """Configs must hold numpy (host) leaves, never device arrays: every
    closed-over device-array constant costs one device->host fetch at MLIR
    lowering time (~50 fetches x link latency on a remote TPU — the round-2
    'reset compile regression'). Guards pvderx/params.py astype and
    make_env_config against reintroducing jnp conversions."""
    import jax

    cfg = core.make_env_config("50", n_sub=40)
    bad = [
        p for p, leaf in jax.tree_util.tree_leaves_with_path(cfg)
        if isinstance(leaf, jax.Array)
    ]
    assert not bad, f"device-array config leaves: {bad}"
    der64 = make_params("10").astype(jnp.float64)
    assert all(not isinstance(x, jax.Array) for x in jax.tree.leaves(der64))
    # host-side event tables too (EventBuilder runs at config time)
    from pvderx.scenario.events import EventBuilder

    ev = EventBuilder()
    ev.add_grid_event(1.0, v=0.5)
    sched = ev.build()
    assert all(not isinstance(x, jax.Array) for x in jax.tree.leaves(sched))


def test_continuous_plus_anomaly_rejected():
    """Round-4 verdict weak #3: make_env_config(continuous=True,
    anomaly_detect=True) was silently accepted although the Box(2) action
    space has no flag channel and _post_window still charges the miss
    penalty. Now a ValueError (mirroring the fleet adapter's guard)."""
    import pytest

    from pvderx.env import make_env_config

    with pytest.raises(ValueError, match="flag channel"):
        make_env_config("10", continuous=True, anomaly_detect=True)
    # each alone stays valid
    make_env_config("10", continuous=True)
    make_env_config("10", anomaly_detect=True)
    # supervisory overrides remain allowed (documented contract): the
    # voltvar/mppt loops take the corresponding setpoint channel over
    make_env_config("10", continuous=True, voltvar_enable=True,
                    mppt_enable=True)


def test_bench_accuracy_path_smoke():
    """bench.measure_f32_accuracy must at least run end-to-end on the CPU
    fallback (round-5 regression: a scenario-builder refactor dropped a
    local and the NameError only surfaced when the full bench ran on the
    chip — the fast gate never executed this path). Tiny n_steps keeps the
    LSODA truth cheap."""
    import bench

    exogs = bench.gate_scenario_exogs(8)
    assert len(exogs) == 8
    err = bench.measure_f32_accuracy("10", n_sub=48, n_steps=8)
    assert err is not None and 0.0 < err < 1e-4
