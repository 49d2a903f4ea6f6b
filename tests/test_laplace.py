"""Laplace approximation tests (legacy laplace_approx; SURVEY.md §2.11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from gaplac_tpu.cli.main import main
from gaplac_tpu.dsl import parse_formula, parse_likelihood
from gaplac_tpu.inference.laplace import (
    build_laplace_marginal,
    laplace_approx,
)
from gaplac_tpu.inference.likelihoods import make_loglik
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import mvn


def _gp_setup(n=30, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-5, 5, n)
    ck = compile_formula(parse_formula("y ~| SqExp(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None])
    K = ck.gram(ck.default_params(), X) + 0.1 * jnp.eye(n)
    return ck, X, K, x


def test_laplace_exact_for_gaussian():
    ck, X, K, x = _gp_setup()
    y = mvn.sample_mvn(jax.random.key(1), K)
    ll = make_loglik(parse_likelihood("Gaussian(0.5)"))
    fit = laplace_approx(K, y, ll)
    exact = float(mvn.mvn_logpdf(K + 0.5 * jnp.eye(30), y))
    np.testing.assert_allclose(float(fit.log_marginal), exact, rtol=1e-6)


def test_laplace_grad_matches_fd():
    ck, X, K, x = _gp_setup()
    rng = np.random.default_rng(2)
    f_true = np.sin(x * 1.5) * 2
    yb = jnp.asarray((rng.uniform(size=30) < 1 / (1 + np.exp(-3 * f_true))).astype(float))
    llb = make_loglik(parse_likelihood("Bernoulli"))

    def lm(l):
        p = ck.default_params().at[0].set(l)
        Kl = ck.gram(p, X) + 0.1 * jnp.eye(30)
        return laplace_approx(Kl, yb, llb).log_marginal

    g = float(jax.grad(lm)(jnp.asarray(1.5)))
    eps = 1e-5
    fd = (float(lm(jnp.asarray(1.5 + eps))) - float(lm(jnp.asarray(1.5 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-4)


def test_cli_laplace_bernoulli(tmp_path):
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(-3, 3, 40))
    f = np.sin(1.5 * x) * 2
    yb = (rng.uniform(size=40) < 1 / (1 + np.exp(-f))).astype(int)
    data = tmp_path / "bin.tsv"
    pd.DataFrame({"x": x, "y": yb}).to_csv(data, sep="\t", index=False)
    out = tmp_path / "chain.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y : Bernoulli ~| SqExp(:x)",
        "--data", str(data), "--infer", "x", "--approx", "laplace",
        "--samples", "40", "--warmup", "80", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert np.isfinite(df["lp"]).all()


def test_cli_laplace_rejects_gaussian(tmp_path):
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 1.0]}).to_csv(data, sep="\t", index=False)
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", str(data),
        "--infer", "x", "--approx", "laplace", "--samples", "5",
    ])
    assert rc == 2


def test_response_transform():
    spec = parse_formula("y*Reads/100 : Binomial(Reads) ~| SqExp(:x)")
    assert spec.response == "y"
    assert spec.transform == (("*", "Reads"), ("/", 100.0))
    assert spec.likelihood.name == "binomial"


def test_markov_laplace_matches_dense():
    """State-space Laplace (--approx sde + non-Gaussian): same GPML Alg 3.1
    objective as the dense build_laplace_marginal, computed by iterated
    Kalman smoothing — must agree to float tolerance in value and gradient,
    incl. a grouped Poisson model."""
    from gaplac_tpu.inference.model import build_model, slot_groups_for

    rng = np.random.default_rng(70)
    n = 80
    x = np.sort(rng.uniform(-4, 4, n))
    f_true = 2 * np.sin(1.3 * x)
    yb = (rng.uniform(size=n) < 1 / (1 + np.exp(-f_true))).astype(float)
    spec = parse_formula("y : Bernoulli ~| OU(:x)")
    ck = compile_formula(spec.formula)
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(yb)
    m_ss = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
    m_d = build_laplace_marginal(ck, slot_groups_for(ck, ["x"]), X, y,
                                 spec.likelihood)
    for uv in (-1.0, 0.2, 1.1):
        u = jnp.asarray([uv])
        a, b = float(m_ss.logdensity(u)), float(m_d.logdensity(u))
        assert abs(a - b) < 1e-8 * max(1.0, abs(b))
        ga = float(jax.grad(m_ss.logdensity)(u)[0])
        gb = float(jax.grad(m_d.logdensity)(u)[0])
        assert abs(ga - gb) < 1e-6 * max(1.0, abs(gb))
    th, f, lp = m_ss.report(jax.random.key(0), jnp.asarray([0.2]))
    assert np.isfinite(float(lp)) and f.shape == (n,)

    g = rng.integers(0, 4, n).astype(float)
    yp = rng.poisson(np.exp(0.5 * np.sin(x))).astype(float)
    spec2 = parse_formula("y : Poisson ~| Matern32(:x)*Cat(:g) + Cat(:g)")
    ck2 = compile_formula(spec2.formula)
    X2 = jnp.asarray(np.stack([x, g, g], 1))
    m2 = build_model(ck2, ["x"], X2, jnp.asarray(yp), spec2.likelihood,
                     approx="sde")
    m2d = build_laplace_marginal(ck2, slot_groups_for(ck2, ["x"]), X2,
                                 jnp.asarray(yp), spec2.likelihood)
    u = jnp.asarray([0.3])
    assert abs(float(m2.logdensity(u)) - float(m2d.logdensity(u))) < 1e-8


def test_cli_mcmc_bernoulli_sde(tmp_path):
    """mcmc with a Bernoulli likelihood + --approx sde runs end-to-end (the
    non-Gaussian longitudinal large-n mode)."""
    import pandas as pd

    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(71)
    n = 60
    x = np.sort(rng.uniform(-4, 4, n))
    f_true = 2 * np.sin(1.3 * x)
    yb = (rng.uniform(size=n) < 1 / (1 + np.exp(-f_true))).astype(int)
    data = tmp_path / "b.tsv"
    pd.DataFrame({"x": x, "y": yb}).to_csv(data, sep="\t", index=False)
    out = tmp_path / "chain.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y : Bernoulli ~| OU(:x)",
        "--data", str(data), "--infer", "x", "--samples", "30",
        "--warmup", "60", "--approx", "sde", "--seed", "1",
        "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert np.isfinite(df["lp"]).all() and (df["ℓ"] > 0).all()
