"""Logging utilities — per-instance named loggers with verbosity levels.

Reference analog: the `Logging` mixin / utility classes giving each DER/sim
object its own named logger and a verbosity knob (SURVEY.md §2.1 #12,
`[pvder:pvder/utility_classes.py]` — unverified upstream path). pvderx keeps
the host-side logging surface (object construction, config load, checkpoint
I/O, benchmark results); anything inside jitted code reports through returned
metrics instead (SURVEY.md §5 observability), since Python logging cannot run
under XLA tracing.
"""
from __future__ import annotations

import logging
import sys

_ROOT = "pvderx"

VERBOSITY = {
    "DEBUG": logging.DEBUG,
    "INFO": logging.INFO,
    "WARNING": logging.WARNING,
    "ERROR": logging.ERROR,
}


def get_logger(name: str | None = None, instance: str | None = None,
               verbosity: str = "INFO") -> logging.Logger:
    """A namespaced logger, e.g. get_logger('env', 'PV_DER-1').

    Mirrors the reference's per-instance log names (each DER object logs under
    its own name). Handlers attach once, at the pvderx root.
    """
    full = _ROOT if name is None else f"{_ROOT}.{name}"
    if instance:
        full = f"{full}.{instance}"
    logger = logging.getLogger(full)
    root = logging.getLogger(_ROOT)
    if not root.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s", "%H:%M:%S"))
        root.addHandler(h)
        root.setLevel(VERBOSITY[verbosity])
    return logger


def set_verbosity(level: str):
    """Set the package-wide log level ('DEBUG'|'INFO'|'WARNING'|'ERROR')."""
    logging.getLogger(_ROOT).setLevel(VERBOSITY[level.upper()])
