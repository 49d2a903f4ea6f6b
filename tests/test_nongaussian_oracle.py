"""Statistical oracle for the NON-Gaussian (whitened latent) path
(VERDICT r1 weak item 5; BASELINE.json config 4).

At tiny n the Bernoulli-GP hyperparameter posterior is computable to
quadrature accuracy:  p(ℓ | y) ∝ p(ℓ) ∫ N(f; 0, K(ℓ)+0.1I) Π p(y_i|f_i) df,
with the n-dim latent integral evaluated by Monte Carlo over COMMON
whitened draws z ~ N(0, I) shared across the whole ℓ grid (f = L(ℓ) z),
which makes the estimated posterior smooth in ℓ and stable to ~1e-3.
The whitened-NUTS ℓ marginal (inference/model.py::build_latent_whitened —
the reference-live formulation, CLI/src/mcmc.jl:35, with a non-Gaussian
likelihood) must match it by KS distance, the same pattern as
test_posterior_exact.py's Gaussian oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.inference.model import build_model
from gaplac_tpu.inference.nuts import run_nuts
from gaplac_tpu.kernels.covariance import compile_formula

N = 9
JITTER = 0.1


@pytest.fixture(scope="module")
def bernoulli_setup():
    rng = np.random.default_rng(11)
    x = np.sort(rng.uniform(-3, 3, N))
    # informative binary outcomes from a smooth latent (l=1.2, amplitude 2.5)
    gen = compile_formula(parse_formula("y ~| SqExp(:x; l=1.2)").formula)
    X = jnp.asarray(x[:, None])
    Kg = np.asarray(gen.gram(gen.default_params(), X)) + JITTER * np.eye(N)
    f_true = 2.5 * np.linalg.cholesky(Kg) @ rng.normal(size=N)
    y = (rng.uniform(size=N) < 1.0 / (1.0 + np.exp(-f_true))).astype(float)
    assert 0 < y.sum() < N  # both classes present

    ck = compile_formula(parse_formula("y ~| SqExp(:x)").formula)

    # MC-quadrature posterior over l in (0, 20): common z draws across grid
    M = 400_000
    z = rng.standard_normal((M, N))
    ls = np.linspace(0.02, 19.98, 400)
    log_py = np.empty(len(ls))
    for i, l in enumerate(ls):
        K = np.asarray(ck.gram(ck.default_params().at[0].set(l), X))
        L = np.linalg.cholesky(K + JITTER * np.eye(N))
        F = z @ L.T                                       # (M, N) latents
        ll = np.sum(y * F - np.logaddexp(0.0, F), axis=1)  # Bernoulli-logit
        log_py[i] = logsumexp(ll) - np.log(M)
    post = np.exp(log_py - logsumexp(log_py))  # flat prior over the grid
    post /= post.sum()
    cdf = np.cumsum(post)
    return X, jnp.asarray(y), ls, cdf


def _ks(samples, ls, cdf):
    samples = np.sort(samples)
    emp = np.arange(1, len(samples) + 1) / len(samples)
    return np.max(np.abs(emp - np.interp(samples, ls, cdf)))


def test_whitened_nuts_matches_bernoulli_quadrature(bernoulli_setup):
    X, y, ls, cdf = bernoulli_setup
    spec = parse_formula("y : Bernoulli ~| SqExp(:x)")
    m = build_model(compile_formula(spec.formula), ["x"], X, y, spec.likelihood,
                    jitter=JITTER)
    assert not m.marginalized and m.dim == 1 + N
    res = jax.jit(
        lambda k: run_nuts(k, m.logdensity, m.initial_position(jax.random.key(2)),
                           4000, num_warmup=1000)
    )(jax.random.key(9))
    assert int(np.asarray(res.diverging).sum()) == 0
    ells = np.asarray(jax.vmap(m.constrain)(res.positions[:, :1])).ravel()
    ks = _ks(ells, ls, cdf)
    assert ks < 0.12, ks


def test_laplace_marginal_consistent_with_quadrature(bernoulli_setup):
    """--approx laplace (inference/laplace.py) on the same problem: the
    Laplace-marginal NUTS posterior is approximate, so only location-scale
    consistency is asserted (quartiles within the oracle's central mass)."""
    from gaplac_tpu.inference.laplace import build_laplace_marginal
    from gaplac_tpu.inference.model import slot_groups_for

    X, y, ls, cdf = bernoulli_setup
    spec = parse_formula("y : Bernoulli ~| SqExp(:x)")
    ck = compile_formula(spec.formula)
    m = build_laplace_marginal(ck, slot_groups_for(ck, ["x"]), X, y,
                               spec.likelihood, jitter=JITTER)
    res = jax.jit(
        lambda k: run_nuts(k, m.logdensity, m.initial_position(jax.random.key(3)),
                           2000, num_warmup=600)
    )(jax.random.key(13))
    ells = np.sort(np.asarray(jax.vmap(m.constrain)(res.positions)).ravel())
    q25, q75 = np.quantile(ells, [0.25, 0.75])
    oq05 = ls[np.searchsorted(cdf, 0.05)]
    oq95 = ls[np.searchsorted(cdf, 0.95)]
    # Laplace quartiles must land inside the oracle's 5-95% band
    assert oq05 < q25 < oq95 and oq05 < q75 < oq95, (q25, q75, oq05, oq95)
