"""JAX runtime configuration for the CLI: platform + precision selection.

TPU-first defaults: float32 on TPU (f64 is software-emulated there), float64
on CPU (matches the Julia reference's numerics for statistical parity).
Must run before any JAX computation.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp

log = logging.getLogger("gaplac")

_configured = {}


def configure(platform: Optional[str] = None, precision: Optional[str] = None):
    """platform: cpu|tpu|None(auto); precision: f32|f64|None(auto)."""
    if platform:
        jax.config.update("jax_platforms", platform)
    backend = jax.default_backend()
    if precision is None:
        precision = "f64" if backend == "cpu" else "f32"
    jax.config.update("jax_enable_x64", precision == "f64")
    dtype = jnp.float64 if precision == "f64" else jnp.float32
    _configured.update(backend=backend, precision=precision, dtype=dtype)
    log.info("JAX backend: %s, precision: %s, devices: %s",
             backend, precision, jax.device_count())
    return dtype


def default_dtype():
    return _configured.get("dtype", jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
