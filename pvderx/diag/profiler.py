"""Profiling / tracing hooks — the TPU-native observability layer.

Reference analog: **none** (SURVEY.md §5 — the reference profiles with print
statements and matplotlib). pvderx wires the idiomatic JAX tools:

- `trace(logdir)`: context manager around `jax.profiler.trace` producing
  TensorBoard/Perfetto traces of the compiled TPU program.
- `compile_report(fn, *args)`: lower + compile a jitted function and return
  XLA's cost analysis (FLOPs, bytes accessed) plus measured wall time — the
  basis for the speed-of-light comparisons in bench notes.
- `force_sync(tree)`: the ONLY trustworthy barrier on this platform — a host
  fetch of a scalar computed from the output. `jax.block_until_ready` is NOT
  a reliable barrier under fully-asynchronous remote dispatch (measured on
  the axon TPU tunnel, 2026-08-21: a chained chunk whose real execution takes
  73 s "completes" in 0.24 ms under block_until_ready, while
  `float(jnp.sum(out))` takes the real 73 s). Every timed path in pvderx
  (bench.py, Stopwatch) synchronizes through force_sync.
- `Stopwatch`: chained-dependency throughput timer. Chaining each call's
  input to the previous call's output stops the device from eliding work;
  force_sync at the ends of the timed region stops the *host* from
  mis-timing asynchronous dispatch as completion.
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def force_sync(tree) -> float:
    """Block until `tree`'s computation has ACTUALLY executed; return a value
    derived from it.

    Dispatches a scalar reduction over EVERY leaf and fetches the combined
    scalar to the host. A host fetch cannot complete before everything
    upstream of the fetched value has run, so this is a true barrier even on
    platforms where `jax.block_until_ready` returns immediately on
    not-yet-executed arrays (the axon remote-TPU tunnel does exactly that —
    see module docstring). All leaves participate (round-5 advice): a
    first-leaf-only fetch would not cover leaves produced by a DIFFERENT
    dispatch or stream. The returned float also defeats any dead-code
    elimination of the timed computation (it may be inf/nan when the tree
    contains sentinel values, e.g. event tables — still a valid barrier).
    """
    acc = None
    for leaf in jax.tree.leaves(tree):
        s = jnp.sum(leaf).astype(jnp.float32)
        acc = s if acc is None else acc + s
    return float(acc)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/pvderx-trace"):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def compile_report(fn, *args, **kwargs) -> dict:
    """Compile `fn(*args)` and report cost analysis + compile wall time."""
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args, **kwargs)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    cost = compiled.cost_analysis() or {}
    mem = compiled.memory_analysis()
    out = {
        "trace_s": t1 - t0,
        "compile_s": t2 - t1,
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
    }
    for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(mem, attr, None)
        if v is not None:
            out[attr] = v
    return out


def device_op_summary(logdir: str, top: int = 20) -> list:
    """Summarize a captured trace: total device time per op name.

    Parses the Chrome-trace JSON that `trace()` writes
    (`<logdir>/plugins/profile/*/\\*.trace.json.gz`) and sums complete-event
    durations on the TPU device track. This is how pvderx's own hot spots
    were found (e.g. the per-env event-table gather that cost 109 us/step at
    16k envs — see scenario/events.active_row). Returns a list of
    (name, total_ms, count), largest first.
    """
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir!r}; run trace() first")
    with gzip.open(paths[-1]) as f:
        events = json.load(f)["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, nm in pids.items() if "TPU" in nm or "/device" in nm}
    if not dev:   # CPU backend traces have only a host track
        dev = set(pids)
    tot, cnt = collections.Counter(), collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev:
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    return [(nm, d / 1e3, cnt[nm]) for nm, d in tot.most_common(top)]


class Stopwatch:
    """Throughput timer for step-like fns with a (state, ...) -> (state, ...)
    signature: chains state through reps so the device cannot elide work.

    >>> sw = Stopwatch(step_fn, state0, n_warmup=2)
    >>> rate = sw.rate(reps=20, items_per_call=n_envs)
    """

    def __init__(self, fn, state0, n_warmup: int = 2, extra_args=()):
        self.fn = fn
        self.extra = tuple(extra_args)
        s = state0
        for _ in range(n_warmup):
            s = self._once(s)
        force_sync(s)
        self.state = s

    def _once(self, s):
        out = self.fn(s, *self.extra)
        return out[0] if isinstance(out, tuple) else out

    def elapsed(self, reps: int = 10) -> float:
        s = self.state
        force_sync(s)          # drain anything already in flight
        t0 = time.perf_counter()
        for _ in range(reps):
            s = self._once(s)
        force_sync(s)          # real barrier: host fetch of a derived scalar
        el = time.perf_counter() - t0
        self.state = s
        return el / reps

    def rate(self, reps: int = 10, items_per_call: int = 1) -> float:
        return items_per_call / self.elapsed(reps)
