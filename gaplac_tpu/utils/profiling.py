"""Tracing / profiling subsystem (SURVEY.md §5 row 1 — absent in the
reference; built here as first-class observability).

Two mechanisms:
  - ``phase(name)``: lightweight wall-clock phase timers accumulated into a
    report (printed at exit when enabled) — the per-phase breakdown the
    benchmark harness uses (gram/cholesky/sampling/io).
  - ``trace(dir)``: a ``jax.profiler`` trace context for deep dives
    (TensorBoard-compatible; works on TPU and CPU).

Enable from the CLI with ``--profile [DIR]``.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

log = logging.getLogger("gaplac")

_phases: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)
_enabled = False


def enable() -> None:
    global _enabled
    _enabled = True


def enabled() -> bool:
    return _enabled


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Accumulate wall-clock under ``name`` (no-op unless enabled)."""
    if not _enabled:
        yield
        return
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        _phases[name] += dt
        _counts[name] += 1


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context when a directory is given."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
    log.info("profiler trace written to %s (view with TensorBoard)", logdir)


def report() -> str:
    if not _phases:
        return ""
    total = sum(_phases.values())
    lines = ["phase breakdown:"]
    for name, t in sorted(_phases.items(), key=lambda kv: -kv[1]):
        lines.append(
            f"  {name:<24s} {t:8.3f}s  ({100 * t / total:5.1f}%)  x{_counts[name]}"
        )
    return "\n".join(lines)


def print_report() -> None:
    r = report()
    if r:
        log.info("%s", r)
        print(r)
