"""Low-rank feature path: ops/lowrank.py + kernels/features.py.

Oracles: the dense path (kernels/covariance.py + ops/mvn.py), which is itself
golden-tested against closed forms.  Finite-rank formulas (Linear/Constant/
Cat/Noise compositions) must match the dense gram EXACTLY; RFF approximations
must converge as m grows (Monte-Carlo tolerance, fixed seeds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.kernels.features import build_feature_map
from gaplac_tpu.ops import lowrank, mvn


def _compiled(formula: str):
    return compile_formula(parse_formula(f"y ~| {formula}").formula)


def _data(ck, n, seed=0):
    rng = np.random.default_rng(seed)
    cols = []
    for v in ck.varnames:
        if v.startswith("g"):  # categorical columns by convention in tests
            cols.append(rng.integers(0, 4, n).astype(float))
        else:
            cols.append(rng.uniform(-3, 3, n))
    return np.stack(cols, axis=1) if cols else np.zeros((n, 0))


# --- exactness: finite-rank formulas --------------------------------------

@pytest.mark.parametrize(
    "formula",
    [
        "Linear(:x)",
        "Linear(:x; c=2.5)",
        "Cat(:g)",
        "Noise(:g; s2=0.7)",
        "Constant(:x; c=1.3)",
        "Cat(:g) * Cat(:g2) + Cat(:g) + Linear(:x) + Noise(:g2; s2=0.5)",
        "Linear(:x; c=1) * Cat(:g) + Constant(:x; c=2.0)",
    ],
)
def test_finite_rank_features_exact(formula):
    ck = _compiled(formula)
    X = jnp.asarray(_data(ck, 40))
    fm = build_feature_map(ck, [np.asarray(X)], num_features=8, seed=0)
    params = ck.default_params(X.dtype)
    K_dense = ck.gram(params, X)
    phi = fm.phi(params, X)
    K_lr = phi @ phi.T + jnp.diag(fm.noise_diag(params, X))
    np.testing.assert_allclose(np.asarray(K_lr), np.asarray(K_dense), atol=1e-9)


def test_bare_noise_goes_to_diag():
    ck = _compiled("SqExp(:x) + Noise(s2=0.9)")
    X = jnp.asarray(_data(ck, 25))
    fm = build_feature_map(ck, [np.asarray(X)], num_features=64, seed=1)
    params = ck.default_params(X.dtype)
    d = fm.noise_diag(params, X)
    np.testing.assert_allclose(np.asarray(d), 0.9, atol=1e-12)
    # and the feature part contains only the SqExp term
    assert fm.m_total == 64


# --- RFF convergence to the stationary kernels -----------------------------

@pytest.mark.parametrize(
    "formula,tol",
    [
        ("SqExp(:x; l=1.3)", 0.06),
        ("OU(:x; l=0.8)", 0.09),
        ("Matern32(:x; l=1.1)", 0.07),
        ("Matern52(:x; l=0.9)", 0.07),
        ("RQ(:x; l=1.0, alpha=1.5)", 0.08),
        ("Periodic(:x; l=1.2, p=2.0)", 0.06),
    ],
)
def test_rff_converges(formula, tol):
    ck = _compiled(formula)
    X = jnp.asarray(_data(ck, 60, seed=3))
    fm = build_feature_map(ck, [np.asarray(X)], num_features=8192, seed=2)
    params = ck.default_params(X.dtype)
    K_dense = np.asarray(ck.gram(params, X))
    phi = np.asarray(fm.phi(params, X))
    err = np.abs(phi @ phi.T - K_dense).max()
    assert err < tol, f"max |K_rff - K| = {err}"


def test_rff_product_and_sum_structure():
    """Products Khatri-Rao, sums concat: SqExp(:t)*Cat(:g) + Linear(:x)."""
    ck = _compiled("SqExp(:t) * Cat(:g) + Linear(:x)")
    X = jnp.asarray(_data(ck, 50, seed=5))
    fm = build_feature_map(ck, [np.asarray(X)], num_features=4096, seed=4)
    params = ck.default_params(X.dtype)
    n_cat = len(np.unique(np.asarray(X)[:, 1]))
    assert fm.m_total == 4096 * n_cat + 2
    K_dense = np.asarray(ck.gram(params, X))
    phi = np.asarray(fm.phi(params, X))
    assert np.abs(phi @ phi.T - K_dense).max() < 0.08


def test_lengthscale_is_differentiable_through_phi():
    ck = _compiled("SqExp(:x)")
    X = jnp.asarray(_data(ck, 20))
    fm = build_feature_map(ck, [np.asarray(X)], num_features=128, seed=0)

    def loss(l):
        params = ck.default_params(X.dtype).at[0].set(l)
        phi = fm.phi(params, X)
        return jnp.sum(phi**2)

    g = jax.grad(loss)(jnp.asarray(1.5, X.dtype))
    assert np.isfinite(float(g)) and float(g) != 0.0


# --- Woodbury ops vs dense oracles -----------------------------------------

def _rand_lowrank(n=80, m=12, seed=7, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    phi = jnp.asarray(rng.standard_normal((n, m)), dtype)
    d = jnp.asarray(rng.uniform(0.5, 2.0, n), dtype)
    y = jnp.asarray(rng.standard_normal(n), dtype)
    return phi, d, y


def test_lowrank_logpdf_matches_dense():
    phi, d, y = _rand_lowrank()
    K = phi @ phi.T + jnp.diag(d)
    lp_dense = mvn.mvn_logpdf(K, y)
    lp_lr = lowrank.lowrank_logpdf(phi, d, y)
    np.testing.assert_allclose(float(lp_lr), float(lp_dense), rtol=1e-9)


def test_lowrank_solve_matches_dense():
    phi, d, y = _rand_lowrank()
    K = np.asarray(phi @ phi.T + jnp.diag(d))
    x = lowrank.lowrank_solve(lowrank.lowrank_chol(phi, d), y)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(K, np.asarray(y)),
                               rtol=1e-8)


def test_lowrank_posterior_predict_matches_dense():
    """Weight-space posterior == function-space GP regression when
    K = Phi Phi^T: mean and marginal variance at held-out features."""
    phi, d, y = _rand_lowrank(n=60, m=10)
    sigma2 = 0.3
    rng = np.random.default_rng(11)
    phi_t = jnp.asarray(rng.standard_normal((17, 10)), phi.dtype)
    # function-space oracle on the EXACT low-rank kernel (no extra diag in K)
    K_xx = phi @ phi.T + jnp.diag(d)
    K_tx = phi_t @ phi.T
    K_tt = phi_t @ phi_t.T
    post_d = mvn.gp_posterior_cache(K_xx, y, sigma2)
    mean_d = mvn.gp_predict_mean(post_d, K_tx)
    var_d = mvn.gp_predict_var(post_d, K_tx, jnp.diagonal(K_tt))
    # weight-space: the diag(d) part of the training cov is independent noise
    # alongside sigma2, so the weight posterior sees D = d + sigma2
    post = lowrank.lowrank_posterior(phi, d + sigma2, y)
    mean_lr = lowrank.lowrank_predict_mean(post, phi_t)
    var_lr = lowrank.lowrank_predict_var(post, phi_t)
    np.testing.assert_allclose(np.asarray(mean_lr), np.asarray(mean_d), rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_lr), np.asarray(var_d), rtol=1e-7,
                               atol=1e-9)


def test_sample_lowrank_moments():
    phi, d, _ = _rand_lowrank(n=30, m=6)
    K = np.asarray(phi @ phi.T + jnp.diag(d))
    draws = jax.vmap(lambda k: lowrank.sample_lowrank(k, phi, d))(
        jax.random.split(jax.random.key(0), 4000)
    )
    draws = np.asarray(draws)
    cov = np.cov(draws.T)
    assert np.abs(cov - K).max() < 0.35 * np.abs(np.diag(K)).max()


def test_conditional_sample_moments():
    """Matheron draw has the exact conditional mean/cov (MC check)."""
    phi, d0, y = _rand_lowrank(n=25, m=5, seed=13)
    s2 = 0.4
    C = np.asarray(phi @ phi.T + jnp.diag(d0))
    S = C + s2 * np.eye(25)
    mean_true = C @ np.linalg.solve(S, np.asarray(y))
    cov_true = C - C @ np.linalg.solve(S, C)
    draws = jax.vmap(
        lambda k: lowrank.lowrank_conditional_sample(k, phi, d0, s2, y)
    )(jax.random.split(jax.random.key(1), 6000))
    draws = np.asarray(draws)
    assert np.abs(draws.mean(0) - mean_true).max() < 0.12
    assert np.abs(np.cov(draws.T) - cov_true).max() < 0.2
