"""In-scan progress reporting via host callbacks.

The TPU-native equivalent of the reference's Turing progress monitor
(``sample(m, NUTS(0.65), n, progress=true)``, CLI/src/mcmc.jl:41): the
sampler loops are single compiled ``lax.scan`` programs, so progress must be
emitted from INSIDE the computation with ``jax.debug.callback``.  Opt-in
(``--progress``): each callback is a host round-trip, which is cheap locally
but can stall a remote device tunnel.
"""

from __future__ import annotations

import sys

import jax


def progress_emitter(phase: str, total: int, enabled: bool):
    """Build an ``emit(i)`` to call inside a scan body with the 0-based
    iteration index; prints every ~5% (and at completion) to stderr."""
    if not enabled or total <= 0:
        return lambda i: None
    stride = max(1, total // 20)

    def _host(i):
        done = int(i) + 1
        end = "\n" if done >= total else ""
        print(f"\r[{phase}] {done}/{total}", end=end, file=sys.stderr, flush=True)

    def emit(i):
        jax.lax.cond(
            ((i + 1) % stride == 0) | (i + 1 == total),
            lambda: jax.debug.callback(_host, i),
            lambda: None,
        )

    return emit
