"""Laplace approximation tests (legacy laplace_approx; SURVEY.md §2.11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from gaplac_tpu.cli.main import main
from gaplac_tpu.dsl import parse_formula, parse_likelihood
from gaplac_tpu.inference.laplace import laplace_approx
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
