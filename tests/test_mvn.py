"""MVN core tests: logpdf vs scipy, posterior vs direct formulas, sampling
moments (SURVEY.md §7.2)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from gaplac_tpu.ops import mvn


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return A @ A.T + n * np.eye(n)


def test_logpdf_vs_scipy():
    n = 20
    K = _spd(n)
    y = np.random.default_rng(1).normal(size=n)
    lp = float(mvn.mvn_logpdf(jnp.asarray(K), jnp.asarray(y)))
    expect = stats.multivariate_normal(mean=np.zeros(n), cov=K).logpdf(y)
    np.testing.assert_allclose(lp, expect, rtol=1e-10)


def test_logpdf_with_jitter_and_mean():
    n = 10
    K = _spd(n, 2)
    y = np.random.default_rng(3).normal(size=n)
    m = 0.7
    lp = float(mvn.mvn_logpdf(jnp.asarray(K), jnp.asarray(y), mean=m, jitter=0.1))
    expect = stats.multivariate_normal(mean=np.full(n, m), cov=K + 0.1 * np.eye(n)).logpdf(y)
    np.testing.assert_allclose(lp, expect, rtol=1e-10)


def test_sample_moments():
    n = 4
    K = _spd(n, 4) / 10
    keys = jax.random.split(jax.random.key(0), 4000)
    draws = jax.vmap(lambda k: mvn.sample_mvn(k, jnp.asarray(K)))(keys)
    emp = np.cov(np.asarray(draws).T)
    np.testing.assert_allclose(emp, K, atol=0.15 * np.abs(K).max())


def test_posterior_matches_direct_formula():
    rng = np.random.default_rng(5)
    n, m = 15, 7
    Kxx = _spd(n, 6)
    Ktx = rng.normal(size=(m, n))
    Ktt = _spd(m, 7)
    y = rng.normal(size=n)
    noise = 0.1
    post = mvn.gp_posterior_cache(jnp.asarray(Kxx), jnp.asarray(y), noise)
    mu = np.asarray(mvn.gp_predict_mean(post, jnp.asarray(Ktx)))
    cov = np.asarray(mvn.gp_predict_cov(post, jnp.asarray(Ktx), jnp.asarray(Ktt)))
    var = np.asarray(mvn.gp_predict_var(post, jnp.asarray(Ktx), jnp.asarray(np.diag(Ktt))))

    S = Kxx + noise * np.eye(n)
    mu_direct = Ktx @ np.linalg.solve(S, y)
    cov_direct = Ktt - Ktx @ np.linalg.solve(S, Ktx.T)
    np.testing.assert_allclose(mu, mu_direct, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(cov, cov_direct, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(var, np.diag(cov_direct), rtol=1e-8, atol=1e-8)


def test_logpdf_grad_finite():
    # differentiability through Cholesky — needed for NUTS over hyperparams
    n = 12
    x = np.linspace(0, 3, n)
    y = np.sin(x)

    def lp(l):
        d = x[:, None] - x[None, :]
        K = jnp.exp(-(d**2) / (2 * l**2))
        return mvn.mvn_logpdf(K, jnp.asarray(y), jitter=0.1)

    g = jax.grad(lp)(jnp.asarray(1.3))
    assert np.isfinite(float(g))
    eps = 1e-5
    fd = (float(lp(jnp.asarray(1.3 + eps))) - float(lp(jnp.asarray(1.3 - eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)
