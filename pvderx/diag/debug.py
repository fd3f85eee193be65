"""Debug / sanitizer mode — the TPU-native analog of race detectors.

Reference analog: **none** (single-threaded Python; SURVEY.md §5). pvderx is
race-free by construction (pure-functional JAX), so the useful sanitizers are
numerical: NaN trapping, checkify assertions inside jitted code, and strict
dtype promotion. Enable them together with `debug_mode()` in tests or when
chasing a divergence.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def debug_mode(nans: bool = True, strict_dtypes: bool = True):
    """Context manager: jax_debug_nans + strict dtype promotion.

    >>> with debug_mode():
    ...     step_batch(state, actions)   # raises on first NaN, at its source
    """
    prev_nan = jax.config.jax_debug_nans
    prev_promo = jax.config.jax_numpy_dtype_promotion
    try:
        if nans:
            jax.config.update("jax_debug_nans", True)
        if strict_dtypes:
            jax.config.update("jax_numpy_dtype_promotion", "strict")
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_numpy_dtype_promotion", prev_promo)


def checked_step(cfg, vdc_band=(0.05, 3.0)):
    """A checkify-wrapped single-env step: errors (NaN state, Vdc out of
    physical band) are reified as a returned Error value instead of silent
    garbage — usable inside jit/vmap on TPU.

    Returns step_fn(state, action) -> (error, (state', obs, r, done, info));
    call `error.throw()` host-side to raise with location info.
    """
    import jax.numpy as jnp
    from jax.experimental import checkify

    from pvderx.env import core

    def stepper(st, action):
        st1, obs, r, done, info = core.step(cfg, st, action)
        checkify.check(jnp.all(jnp.isfinite(st1.y)),
                       "non-finite state after step")
        vdc = st1.y[6 * cfg.der.n_ph]
        checkify.check((vdc > vdc_band[0]) & (vdc < vdc_band[1]),
                       "Vdc left the physical band")
        return st1, obs, r, done, info

    return checkify.checkify(stepper)
