"""--prior generalization (VERDICT r1 item 7): Uniform/LogNormal/Gamma/
TruncatedNormal through the transform registry (inference/priors.py).

Reference parity anchor: the reference hardcodes ℓ ~ Uniform(0,20)
(/root/reference/CLI/src/mcmc.jl:32); everything beyond Uniform is a
capability extension.  Correctness oracles: (a) each prior's constrained
density integrates to 1; (b) logprior_u is the exact change of variables of
logprior_x; (c) the prior actually routes into the model — the quadrature
posterior with the prior weight matches NUTS draws (same pattern as
test_posterior_exact.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import quad
from scipy.special import logsumexp

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.inference.model import build_model
from gaplac_tpu.inference.nuts import run_nuts
from gaplac_tpu.inference.priors import (
    GammaPrior,
    LogNormalPrior,
    TruncatedNormalPrior,
    UniformPrior,
    parse_prior,
)
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import mvn

PRIORS = [
    UniformPrior(0.0, 20.0),
    LogNormalPrior(0.3, 0.7),
    GammaPrior(3.0, 2.0),
    TruncatedNormalPrior(2.0, 1.5, 0.0, 20.0),
]


@pytest.mark.parametrize("prior", PRIORS, ids=lambda p: type(p).__name__)
def test_constrained_density_normalizes(prior):
    dens = lambda x: float(jnp.exp(prior.logprior_x(jnp.asarray(x))))
    lo = getattr(prior, "lo", 0.0)
    hi = getattr(prior, "hi", np.inf)
    total, err = quad(dens, lo, hi, limit=200)
    assert abs(total - 1.0) < max(1e-6, 10 * err)


@pytest.mark.parametrize("prior", PRIORS, ids=lambda p: type(p).__name__)
def test_unconstrained_density_is_change_of_variables(prior):
    """logprior_u(u) == logprior_x(forward(u)) + log|d forward/du| (the
    jacobian obtained by JAX autodiff, so no hand-derived terms are trusted)."""
    us = jnp.linspace(-4.0, 2.5, 31)
    fwd = lambda u: prior.forward(u)
    jac = jax.vmap(jax.grad(fwd))(us)
    lhs = jax.vmap(prior.logprior_u)(us)
    rhs = jax.vmap(prior.logprior_x)(fwd(us)) + jnp.log(jac)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("prior", PRIORS, ids=lambda p: type(p).__name__)
def test_forward_inverse_roundtrip(prior):
    xs = jnp.asarray([0.2, 1.0, 3.7, 12.0])
    np.testing.assert_allclose(
        np.asarray(prior.forward(prior.inverse(xs))), np.asarray(xs), rtol=1e-6
    )


def test_parse_prior_registry():
    assert parse_prior("Uniform(0, 20)") == UniformPrior(0.0, 20.0)
    assert parse_prior("LogNormal(0.5, 1)") == LogNormalPrior(0.5, 1.0)
    assert parse_prior("Gamma(2, 0.5)") == GammaPrior(2.0, 0.5)
    assert parse_prior("TruncatedNormal(1, 2, 0, 10)") == TruncatedNormalPrior(
        1.0, 2.0, 0.0, 10.0
    )
    assert parse_prior("TruncNormal(1, 2, 0, 10)") == TruncatedNormalPrior(
        1.0, 2.0, 0.0, 10.0
    )
    for bad in ["Cauchy(0,1)", "Uniform(5, 2)", "Gamma(-1, 1)", "LogNormal(0, 0)",
                "Uniform(0)", "garbage", "Uniform(a, b)"]:
        with pytest.raises(ValueError):
            parse_prior(bad)


@pytest.fixture(scope="module")
def gp_data():
    rng = np.random.default_rng(42)
    x = rng.uniform(-5, 5, 40)
    gen = compile_formula(parse_formula("y ~| SqExp(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None])
    y = mvn.sample_mvn(jax.random.key(4), gen.gram(gen.default_params(), X), jitter=0.1)
    ck = compile_formula(parse_formula("y ~| SqExp(:x)").formula)
    ls = np.linspace(0.01, 19.99, 500)
    # collapsed data log-likelihood on the grid (prior added per-test)
    llik = np.array([
        float(mvn.mvn_logpdf(
            ck.gram(ck.default_params().at[0].set(l), X) + 1.1 * jnp.eye(40), y
        ))
        for l in ls
    ])
    return X, y, ls, llik


def _posterior_cdf(ls, llik, prior):
    lp = llik + np.asarray(jax.vmap(prior.logprior_x)(jnp.asarray(ls)))
    post = np.exp(lp - logsumexp(lp))
    post /= post.sum()
    return np.cumsum(post)


def _ks(samples, ls, cdf):
    samples = np.sort(samples)
    emp = np.arange(1, len(samples) + 1) / len(samples)
    theo = np.interp(samples, ls, cdf)
    return np.max(np.abs(emp - theo))


def test_model_logdensity_includes_prior(gp_data):
    """Deterministic routing check: build_model with each prior evaluates to
    collapsed-likelihood + logprior_u at matching l values."""
    X, y, ls, llik = gp_data
    spec = parse_formula("y ~| SqExp(:x)")
    ck = compile_formula(spec.formula)
    for prior in PRIORS:
        m = build_model(ck, ["x"], X, y, spec.likelihood, prior_bounds=prior)
        for l, ll in [(ls[40], llik[40]), (ls[120], llik[120])]:
            u = jnp.asarray([float(prior.inverse(jnp.asarray(l)))])
            got = float(m.logdensity(u))
            want = ll + float(prior.logprior_u(u[0]))
            assert abs(got - want) < 1e-6 * max(1.0, abs(want)), type(prior).__name__


def test_lognormal_prior_shifts_nuts_posterior(gp_data):
    """An informative LogNormal prior pulls the posterior; NUTS must match the
    prior-weighted quadrature, and differ measurably from the Uniform case."""
    X, y, ls, llik = gp_data
    prior = LogNormalPrior(-0.7, 0.4)  # mode ~0.42, pulls l well below the MLE
    spec = parse_formula("y ~| SqExp(:x)")
    m = build_model(compile_formula(spec.formula), ["x"], X, y, spec.likelihood,
                    prior_bounds=prior)
    res = jax.jit(
        lambda k: run_nuts(k, m.logdensity, m.initial_position(jax.random.key(3)),
                           1500, num_warmup=500)
    )(jax.random.key(11))
    ells = np.asarray(jax.vmap(m.constrain)(res.positions)).ravel()

    cdf = _posterior_cdf(ls, llik, prior)
    assert _ks(ells, ls, cdf) < 0.12

    # and the prior genuinely moved the posterior vs the reference Uniform
    cdf_u = _posterior_cdf(ls, llik, UniformPrior(0.0, 20.0))
    mean_ln = float(np.sum(np.diff(np.concatenate([[0], cdf])) * ls))
    mean_u = float(np.sum(np.diff(np.concatenate([[0], cdf_u])) * ls))
    assert mean_ln < mean_u - 0.05
    assert abs(np.mean(ells) - mean_ln) < 0.2


def test_gamma_prior_matches_quadrature(gp_data):
    X, y, ls, llik = gp_data
    prior = GammaPrior(2.0, 1.5)
    spec = parse_formula("y ~| SqExp(:x)")
    m = build_model(compile_formula(spec.formula), ["x"], X, y, spec.likelihood,
                    prior_bounds=prior)
    res = jax.jit(
        lambda k: run_nuts(k, m.logdensity, m.initial_position(jax.random.key(8)),
                           1500, num_warmup=500)
    )(jax.random.key(21))
    ells = np.asarray(jax.vmap(m.constrain)(res.positions)).ravel()
    assert _ks(ells, ls, _posterior_cdf(ls, llik, prior)) < 0.12
