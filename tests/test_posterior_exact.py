"""Exact-posterior validation: for a single hyperparameter the posterior
p(l | y) is computable by quadrature, so NUTS/ChEES/SMC must all match it —
the strongest correctness oracle the GP model admits (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.inference.model import build_model
from gaplac_tpu.inference.nuts import run_nuts
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import mvn


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    x = rng.uniform(-5, 5, 50)
    gen = compile_formula(parse_formula("y ~| SqExp(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None])
    y = mvn.sample_mvn(jax.random.key(4), gen.gram(gen.default_params(), X), jitter=0.1)
    ck = compile_formula(parse_formula("y ~| SqExp(:x)").formula)

    # quadrature posterior over l in (0, 20)
    ls = np.linspace(0.01, 19.99, 600)
    lps = np.array([
        float(mvn.mvn_logpdf(
            ck.gram(ck.default_params().at[0].set(l), X) + 1.1 * jnp.eye(50), y
        ))
        for l in ls
    ])
    post = np.exp(lps - logsumexp(lps))
    post /= post.sum()
    cdf = np.cumsum(post)
    return X, y, ls, cdf


@pytest.fixture(scope="module")
def setup_matern():
    rng = np.random.default_rng(7)
    x = rng.uniform(-5, 5, 40)
    gen = compile_formula(parse_formula("y ~| Matern32(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None])
    y = mvn.sample_mvn(jax.random.key(9), gen.gram(gen.default_params(), X), jitter=0.1)
    ck = compile_formula(parse_formula("y ~| Matern32(:x)").formula)
    ls = np.linspace(0.01, 19.99, 600)
    lps = np.array([
        float(mvn.mvn_logpdf(
            ck.gram(ck.default_params().at[0].set(l), X) + 1.1 * jnp.eye(40), y
        ))
        for l in ls
    ])
    post = np.exp(lps - logsumexp(lps))
    post /= post.sum()
    cdf = np.cumsum(post)
    return X, y, ls, cdf


def _ks(samples, ls, cdf):
    """KS distance between sampled l values and the quadrature posterior."""
    samples = np.sort(samples)
    emp = np.arange(1, len(samples) + 1) / len(samples)
    theo = np.interp(samples, ls, cdf)
    return np.max(np.abs(emp - theo))


def test_nuts_matches_quadrature(setup):
    X, y, ls, cdf = setup
    spec = parse_formula("y ~| SqExp(:x)")
    m = build_model(compile_formula(spec.formula), ["x"], X, y, spec.likelihood)
    res = jax.jit(
        lambda k: run_nuts(k, m.logdensity, m.initial_position(jax.random.key(3)),
                           1500, num_warmup=500)
    )(jax.random.key(14))
    ells = np.asarray(jax.vmap(m.constrain)(res.positions)).ravel()
    # KS should be small given autocorrelation (effective n ~ several hundred)
    assert _ks(ells, ls, cdf) < 0.12


def test_chees_matches_quadrature(setup):
    from gaplac_tpu.inference.chees import run_chees

    X, y, ls, cdf = setup
    spec = parse_formula("y ~| SqExp(:x)")
    m = build_model(compile_formula(spec.formula), ["x"], X, y, spec.likelihood)
    q0 = jax.vmap(m.initial_position)(jax.random.split(jax.random.key(5), 16))
    res = jax.jit(lambda k: run_chees(k, m.logdensity, q0, 300, num_warmup=400))(
        jax.random.key(6)
    )
    ells = np.asarray(jax.vmap(jax.vmap(m.constrain))(res.positions)).ravel()
    assert _ks(ells, ls, cdf) < 0.12


def test_smc_particles_match_quadrature(setup):
    from gaplac_tpu.inference.smc import smc_log_evidence_gp

    X, y, ls, cdf = setup
    spec = parse_formula("y ~| SqExp(:x)")
    m = build_model(compile_formula(spec.formula), ["x"], X, y, spec.likelihood)
    res = smc_log_evidence_gp(jax.random.key(0), m, n_particles=1024)
    ells = np.asarray(jax.vmap(m.constrain)(res.particles)).ravel()
    assert _ks(ells, ls, cdf) < 0.15


def test_nuts_matches_quadrature_matern(setup_matern):
    """Same quadrature oracle on a Matern32 model — validates the extended
    kernels' gradients/density through the full sampler path."""
    X, y, ls, cdf = setup_matern
    spec = parse_formula("y ~| Matern32(:x)")
    m = build_model(compile_formula(spec.formula), ["x"], X, y, spec.likelihood)
    res = jax.jit(
        lambda k: run_nuts(k, m.logdensity, m.initial_position(jax.random.key(3)),
                           1200, num_warmup=400)
    )(jax.random.key(7))
    ells = np.asarray(jax.vmap(m.constrain)(res.positions)).ravel()
    assert _ks(ells, ls, cdf) < 0.12
