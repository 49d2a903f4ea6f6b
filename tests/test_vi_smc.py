"""VI and SMC tests: analytic oracles (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.inference.model import GPModel, build_model
from gaplac_tpu.inference.smc import run_smc, smc_log_evidence_gp
from gaplac_tpu.inference.vi import run_advi, sample_posterior
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import mvn


def test_advi_gaussian_target():
    cov = np.array([[2.0, 0.0], [0.0, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mdl = GPModel(
        2, 2, lambda q: -0.5 * q @ prec @ q, None, None,
        lambda k: jax.random.normal(k, (2,)), True,
    )
    r = run_advi(jax.random.key(2), mdl, num_steps=2500, learning_rate=0.03)
    np.testing.assert_allclose(np.asarray(r.mu), [0, 0], atol=0.2)
    np.testing.assert_allclose(
        np.exp(np.asarray(r.log_sigma)), [np.sqrt(2), np.sqrt(0.5)], rtol=0.15
    )
    draws = sample_posterior(jax.random.key(3), r, 4000)
    np.testing.assert_allclose(np.asarray(draws).std(0), [1.414, 0.707], rtol=0.2)


def test_smc_conjugate_evidence():
    # y_i ~ N(theta, 1), theta ~ N(0, 1): evidence has closed form
    rng = np.random.default_rng(0)
    y = rng.normal(0.5, 1.0, size=20)
    yj = jnp.asarray(y)
    logprior = lambda u: -0.5 * jnp.sum(u**2) - 0.5 * np.log(2 * np.pi)
    loglik = lambda u: jnp.sum(-0.5 * (yj - u[0]) ** 2 - 0.5 * np.log(2 * np.pi))
    sample_prior = lambda k, n: jax.random.normal(k, (n, 1))
    res = jax.jit(
        lambda k: run_smc(k, sample_prior, logprior, loglik, n_particles=1024)
    )(jax.random.key(1))
    n = len(y)
    exact = stats.multivariate_normal(np.zeros(n), np.eye(n) + np.ones((n, n))).logpdf(y)
    assert abs(float(res.log_evidence) - exact) < 0.3
    assert float(res.final_beta) == 1.0
    # posterior mean of theta: sum(y)/(n+1)
    assert abs(float(res.particles.mean()) - y.sum() / (n + 1)) < 0.1


def test_smc_gp_evidence_vs_quadrature():
    # 1-D hyperparameter: SMC evidence must match direct quadrature over
    # the Uniform(0,20) prior
    rng = np.random.default_rng(5)
    x = rng.uniform(-5, 5, 30)
    gen = compile_formula(parse_formula("y ~| SqExp(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None])
    K = gen.gram(gen.default_params(), X)
    y = mvn.sample_mvn(jax.random.key(4), K, jitter=0.1)

    spec = parse_formula("y ~| SqExp(:x)")
    ck = compile_formula(spec.formula)
    model = build_model(ck, ["x"], X, y, spec.likelihood)
    res = smc_log_evidence_gp(jax.random.key(0), model, n_particles=512)

    # quadrature: log(1/20 * int p(y|l) dl)
    ls = np.linspace(1e-3, 20 - 1e-3, 400)
    lps = []
    for l in ls:
        p = ck.default_params().at[0].set(l)
        S = ck.gram(p, X) + 1.1 * jnp.eye(30)
        lps.append(float(mvn.mvn_logpdf(S, y)))
    lps = np.array(lps)
    from scipy.special import logsumexp

    quad = logsumexp(lps) + np.log(ls[1] - ls[0]) - np.log(20.0)
    assert abs(float(res.log_evidence) - quad) < 0.3


def test_advi_gp_agrees_with_posterior_shape():
    rng = np.random.default_rng(42)
    x = rng.uniform(-5, 5, 40)
    gen = compile_formula(parse_formula("y ~| SqExp(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None])
    K = gen.gram(gen.default_params(), X)
    y = mvn.sample_mvn(jax.random.key(4), K, jitter=0.1)
    spec = parse_formula("y ~| SqExp(:x)")
    model = build_model(compile_formula(spec.formula), ["x"], X, y, spec.likelihood)
    r = run_advi(jax.random.key(1), model, num_steps=1500)
    draws = sample_posterior(jax.random.key(2), r, 500)
    ells = np.asarray(jax.vmap(model.constrain)(draws)).ravel()
    assert 0.8 < np.median(ells) < 6.0  # same region as NUTS posterior
