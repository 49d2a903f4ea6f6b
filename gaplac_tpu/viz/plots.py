"""Plotting — matplotlib equivalents of the reference's CairoMakie plots.

``sample_plot`` reproduces /root/reference/src/plotting.jl:1-26: scatter the
drawn samples, refit a GP posterior on them (noise 0.1), and draw the
posterior mean line with a mean +- variance band over a 100-point grid
spanning the data +-1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import jax.numpy as jnp

from gaplac_tpu.kernels.covariance import CompiledKernel
from gaplac_tpu.ops import mvn


def sample_plot(
    ck: CompiledKernel,
    x: np.ndarray,
    y: np.ndarray,
    xlabel: str,
    ylabel: str,
    noise: float = mvn.DEFAULT_JITTER,
):
    """1-D sample plot with posterior smoothing (ref: plotting.jl:1-26)."""
    X = jnp.asarray(np.asarray(x, float)[:, None])
    # float dtype: integer data columns must not truncate fractional
    # hyperparameter defaults (l=0.5 -> 0)
    params = ck.default_params(X.dtype)
    yj = jnp.asarray(np.asarray(y, float))

    xmin, xmax = float(np.min(x)) - 1.0, float(np.max(x)) + 1.0
    xtest = np.linspace(xmin, xmax, 100)
    Xt = jnp.asarray(xtest[:, None])

    K_xx = ck.gram(params, X)
    K_tx = ck.gram(params, Xt, X)
    k_tt = ck.gram_diag(params, Xt)
    post = mvn.gp_posterior_cache(K_xx, yj, noise)
    ym = np.asarray(mvn.gp_predict_mean(post, K_tx))
    yvar = np.asarray(mvn.gp_predict_var(post, K_tx, k_tt))

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.scatter(x, y, color="purple", label="samples", zorder=3, s=18)
    ax.plot(xtest, ym, color="dodgerblue", label="mean posterior")
    # ref bands are mean +- variance (plotting.jl:19), not +-sd
    ax.fill_between(xtest, ym - yvar, ym + yvar, color="dodgerblue", alpha=0.3,
                    label="var posterior")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(f"Sample from posterior, x from {xmin:.2f} to {xmax:.2f}")
    ax.legend()
    fig.tight_layout()
    return fig


def grouped_sample_plot(
    x: np.ndarray,
    y: np.ndarray,
    groups: Optional[np.ndarray],
    xlabel: str,
    ylabel: str,
    grouplabel: Optional[str] = None,
):
    """Scatter + per-group connecting lines (legacy ``--plotx "x:group"``,
    bin/old_options.jl:116-118 / test/oldtests.jl:48)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    x, y = np.asarray(x, float), np.asarray(y, float)
    if groups is None:
        order = np.argsort(x)
        ax.scatter(x, y, color="purple", s=18, zorder=3)
        ax.plot(x[order], y[order], color="purple", lw=0.8, alpha=0.5)
    else:
        groups = np.asarray(groups)
        levels = list(dict.fromkeys(groups.tolist()))
        cmap = plt.get_cmap("tab10")
        for i, g in enumerate(levels):
            m = groups == g
            order = np.argsort(x[m])
            color = cmap(i % 10)
            ax.scatter(x[m], y[m], color=color, s=18, zorder=3,
                       label=f"{grouplabel}={g}")
            ax.plot(x[m][order], y[m][order], color=color, lw=0.8, alpha=0.6)
        if len(levels) <= 12:
            ax.legend()
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.tight_layout()
    return fig


def trace_plot(draws: np.ndarray, names: Sequence[str]):
    """Trace + histogram per hyperparameter, (chains, draws, k) array."""
    draws = np.asarray(draws)
    if draws.ndim == 2:
        draws = draws[None]
    c, n, k = draws.shape
    fig, axes = plt.subplots(k, 2, figsize=(10, 2.6 * k), squeeze=False)
    for j in range(k):
        for ci in range(c):
            axes[j][0].plot(draws[ci, :, j], lw=0.7, alpha=0.8)
        axes[j][0].set_ylabel(names[j])
        axes[j][1].hist(draws[:, :, j].ravel(), bins=40, color="dodgerblue", alpha=0.8)
    axes[-1][0].set_xlabel("iteration")
    fig.tight_layout()
    return fig


def predict_plot(x, ymu, y05, y95, data_x=None, data_y=None, xlabel="x", ylabel="y"):
    """Posterior predictive ribbon (legacy predict plot, test/pred.jl:17-19)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    order = np.argsort(np.asarray(x))
    x, ymu, y05, y95 = (np.asarray(a)[order] for a in (x, ymu, y05, y95))
    if data_x is not None:
        ax.scatter(data_x, data_y, color="purple", s=14, alpha=0.6, label="data")
    ax.plot(x, ymu, color="dodgerblue", label="posterior mean")
    ax.fill_between(x, y05, y95, color="dodgerblue", alpha=0.3, label="5-95% band")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.legend()
    fig.tight_layout()
    return fig
