"""Chain diagnostics: split-R̂ and effective sample size.

The reference has none of this (Turing prints summary stats).  Built here as
first-class observability (SURVEY.md §2.4 "cross-chain R̂/ESS via
collectives"): the functions are pure jnp over a (chains, draws, ...) leading
axis, so under ``shard_map`` the chain axis reduces ride ICI via psum.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def split_chains(x: jnp.ndarray) -> jnp.ndarray:
    """(chains, draws) -> (2*chains, draws//2)."""
    c, n = x.shape[0], x.shape[1] // 2
    return jnp.concatenate([x[:, :n], x[:, n : 2 * n]], axis=0)


def rhat(x: jnp.ndarray) -> jnp.ndarray:
    """Split-R̂ (Gelman-Rubin) for (chains, draws) scalar chains."""
    x = split_chains(x)
    m, n = x.shape
    chain_means = jnp.mean(x, axis=1)
    chain_vars = jnp.var(x, axis=1, ddof=1)
    w = jnp.mean(chain_vars)
    b = n * jnp.var(chain_means, ddof=1)
    var_plus = (n - 1) / n * w + b / n
    return jnp.sqrt(var_plus / w)


def ess(x: jnp.ndarray, max_lag: int | None = None) -> jnp.ndarray:
    """Bulk ESS via Geyer initial monotone sequence over pooled autocorrelation
    (Stan's formulation, computed densely — fine for max_lag <= draws)."""
    x = np.asarray(split_chains(jnp.asarray(x)))
    m, n = x.shape
    if max_lag is None:
        max_lag = n - 1
    xc = x - x.mean(axis=1, keepdims=True)
    # per-chain autocovariance via FFT
    fsize = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, fsize, axis=1)
    acov = np.fft.irfft(f * np.conj(f), fsize, axis=1)[:, : n].real / n
    chain_var = acov[:, 0] * n / (n - 1)
    w = chain_var.mean()
    # Stan: var_plus = W*(n-1)/n + B/n, and W*(n-1)/n == mean(acov[:, 0])
    var_plus = acov[:, 0].mean()
    if m > 1:
        var_plus += x.mean(axis=1).var(ddof=1)
    rho = 1.0 - (w - acov.mean(axis=0)) / var_plus  # rho[0] == 1
    rho = rho[: max_lag + 1]
    # Geyer: sum of adjacent pairs, positive + monotone decreasing
    even = rho[0::2]
    odd = rho[1::2]
    k = min(len(even), len(odd))
    pair = even[:k] + odd[:k]
    pos = pair > 0
    first_neg = np.argmax(~pos) if (~pos).any() else k
    pair = pair[:first_neg]
    pair = np.minimum.accumulate(pair) if len(pair) else pair
    tau = -1.0 + 2.0 * pair.sum()
    tau = max(tau, 1.0 / np.log10(n * m + 10.0))
    return np.asarray(m * n / tau)


def summarize(name: str, x: jnp.ndarray) -> dict:
    """Per-parameter summary over (chains, draws)."""
    arr = np.asarray(x)
    return {
        "param": name,
        "mean": float(arr.mean()),
        "std": float(arr.std()),
        "q5": float(np.quantile(arr, 0.05)),
        "q95": float(np.quantile(arr, 0.95)),
        "rhat": float(rhat(jnp.asarray(arr))) if arr.shape[0] > 1 and arr.shape[1] > 3 else float("nan"),
        "ess": float(ess(jnp.asarray(arr))) if arr.shape[1] > 3 else float("nan"),
    }
