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


# --- model + CLI integration ------------------------------------------------

def test_lowrank_marginal_model_matches_dense_on_finite_rank():
    """On a finite-rank formula the low-rank marginal logdensity equals the
    dense marginal logdensity at every theta (features are exact)."""
    from gaplac_tpu.inference.model import (
        build_gaussian_marginal,
        build_gaussian_marginal_lowrank,
        slot_groups_for,
    )

    ck = _compiled("Linear(:x) + Cat(:g) + Noise(s2=0.4)")
    X = jnp.asarray(_data(ck, 35, seed=9))
    y = jnp.asarray(np.random.default_rng(10).standard_normal(35))
    groups = slot_groups_for(ck, ["x"])
    dense = build_gaussian_marginal(ck, groups, X, y)
    lr = build_gaussian_marginal_lowrank(ck, groups, X, y, num_features=16)
    assert dense.dim == lr.dim == 1
    for u in [-1.5, 0.0, 0.7, 2.0]:
        uu = jnp.asarray([u], X.dtype)
        np.testing.assert_allclose(
            float(lr.logdensity(uu)), float(dense.logdensity(uu)), rtol=1e-8
        )
    # report: theta identical, f a valid conditional draw, lp finite
    th_d, _, _ = dense.report(jax.random.key(0), jnp.asarray([0.3], X.dtype))
    th_l, f_l, lp_l = lr.report(jax.random.key(0), jnp.asarray([0.3], X.dtype))
    np.testing.assert_allclose(np.asarray(th_l), np.asarray(th_d), rtol=1e-12)
    assert np.isfinite(np.asarray(f_l)).all() and np.isfinite(float(lp_l))


def test_cli_mcmc_rff_recovers_lengthscale(tmp_path):
    """mcmc --approx rff: the NUTS posterior over l matches the QUADRATURE
    posterior of the same low-rank marginal within MC error (the guide data
    at n=50 / sigma=1 has a flat marginal in l, so the oracle is quadrature
    on this data, not the asymptotic ~1.5 — same convention as
    test_posterior_exact.py)."""
    import pandas as pd

    from gaplac_tpu.cli.main import main

    data = tmp_path / "d.tsv"
    rc = main([
        "--platform", "cpu", "sample", "y :~| SqExp(:x; l=1.5)",
        "--at", "x = rand(Uniform(-5,5), 50)", "--seed", "3",
        "--output", str(data),
    ])
    assert rc == 0
    chain = tmp_path / "chain.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", str(data),
        "--infer", "x", "--samples", "150", "--warmup", "150",
        "--approx", "rff", "--rff-features", "384",
        "--seed", "0", "--output", str(chain),
    ])
    assert rc == 0
    df = pd.read_csv(chain, sep="\t")
    assert np.isfinite(df["lp"]).all()

    # quadrature oracle: p(l | y) ∝ N(y; 0, Phi_l Phi_l^T + (jitter+sigma2) I)
    # under the flat Uniform(0,20) prior, with the SAME feature map the CLI
    # built (seed 0, m=384)
    tab = pd.read_csv(data, sep="\t")
    X = jnp.asarray(tab[["x"]].to_numpy())
    y = jnp.asarray(tab["y"].to_numpy())
    ck = _compiled("SqExp(:x)")
    fm = build_feature_map(ck, [np.asarray(X)], num_features=384, seed=0)
    grid = np.linspace(0.02, 19.98, 500)
    lls = np.array([
        float(lowrank.lowrank_logpdf(
            fm.phi(ck.default_params(X.dtype).at[0].set(l), X), 0.1 + 1.0, y
        ))
        for l in grid
    ])
    w = np.exp(lls - lls.max())
    quad_mean = float((grid * w).sum() / w.sum())
    quad_sd = float(np.sqrt((grid**2 * w).sum() / w.sum() - quad_mean**2))

    post_mean = df["ℓ"].mean()
    # MC error with ESS >~ 50: allow ~4 standard errors
    assert abs(post_mean - quad_mean) < 4 * quad_sd / np.sqrt(50), (
        f"NUTS mean {post_mean:.3f} vs quadrature {quad_mean:.3f} "
        f"(sd {quad_sd:.3f})"
    )


def test_cli_select_formulae_rff_matches_dense(tmp_path):
    """select --formulae --approx rff reproduces the dense Bayes factor on a
    finite-rank pair exactly, and tracks it for RFF formulas."""
    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(4)
    data = tmp_path / "d.tsv"
    import pandas as pd

    pd.DataFrame({
        "x": rng.uniform(-3, 3, 60), "g": rng.integers(0, 3, 60).astype(float),
        "y": rng.standard_normal(60),
    }).to_csv(data, sep="\t", index=False)

    f1, f2 = "y ~| Linear(:x) + Cat(:g)", "y ~| Cat(:g)"
    args_dense = ["--platform", "cpu", "select", "--formulae", f1, f2,
                  "--data", str(data)]
    args_rff = args_dense + ["--approx", "rff", "--rff-features", "8"]

    bayes_dense = _run_select(args_dense)
    bayes_rff = _run_select(args_rff)
    np.testing.assert_allclose(bayes_rff, bayes_dense, rtol=1e-6)


def _run_select(argv):
    """Invoke the select command in-process and return its Bayes factor."""
    from gaplac_tpu.cli import select_cmd
    from gaplac_tpu.cli.main import build_parser
    from gaplac_tpu.cli.runtime import configure

    args = build_parser().parse_args(argv)
    configure(args.platform, args.precision)
    return select_cmd.run(args)


def test_cli_predict_rff_matches_dense_on_finite_rank(tmp_path):
    """predict --approx rff reproduces the dense ymu/yQ ribbons exactly on a
    finite-rank formula (the feature expansion is exact there)."""
    import pandas as pd

    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(7)
    data = tmp_path / "d.tsv"
    pd.DataFrame({
        "x": rng.uniform(-3, 3, 50), "g": rng.integers(0, 3, 50).astype(float),
        "y": rng.standard_normal(50),
    }).to_csv(data, sep="\t", index=False)

    outs = {}
    for mode, extra in [("dense", []), ("rff", ["--approx", "rff",
                                                "--rff-features", "8"])]:
        out = tmp_path / f"p_{mode}.tsv"
        rc = main([
            "--platform", "cpu", "predict", "y ~| Linear(:x) + Cat(:g)",
            "--data", str(data), "--at", "x=-4:0.5:4; g=0:1:2",
            "--output", str(out), *extra,
        ])
        assert rc == 0
        outs[mode] = pd.read_csv(out, sep="\t")

    for col in ("ymu", "yQ050", "yQ950"):
        np.testing.assert_allclose(
            outs["rff"][col], outs["dense"][col], rtol=1e-6, atol=1e-8
        )


def test_conditional_sample_at_moments():
    """Matheron draw AT TEST FEATURES has the exact predictive mean/cov."""
    phi, d0, y = _rand_lowrank(n=25, m=5, seed=17)
    rng = np.random.default_rng(18)
    phi_t = jnp.asarray(rng.standard_normal((12, 5)), phi.dtype)
    d0_t = jnp.asarray(rng.uniform(0.2, 0.8, 12), phi.dtype)
    s2 = 0.5
    K_xx = np.asarray(phi @ phi.T + jnp.diag(d0))
    K_tx = np.asarray(phi_t @ phi.T)
    K_tt = np.asarray(phi_t @ phi_t.T + jnp.diag(d0_t))
    S = K_xx + s2 * np.eye(25)
    mean_true = K_tx @ np.linalg.solve(S, np.asarray(y))
    cov_true = K_tt - K_tx @ np.linalg.solve(S, K_tx.T)
    draws = jax.vmap(
        lambda k: lowrank.lowrank_conditional_sample_at(k, phi, d0, s2, y, phi_t, d0_t)
    )(jax.random.split(jax.random.key(2), 8000))
    draws = np.asarray(draws)
    assert np.abs(draws.mean(0) - mean_true).max() < 0.1
    assert np.abs(np.cov(draws.T) - cov_true).max() < 0.25


def test_cli_sample_rff_prior_and_posterior(tmp_path):
    """sample --approx rff: prior and posterior (--data) draws run end-to-end
    and produce finite responses with the right shapes."""
    import pandas as pd

    from gaplac_tpu.cli.main import main

    prior = tmp_path / "prior.tsv"
    rc = main([
        "--platform", "cpu", "sample", "y :~| SqExp(:x; l=1.5) + Cat(:g)",
        "--at", "x = rand(Uniform(-5,5), 40); g=[0,1]",
        "--approx", "rff", "--rff-features", "128",
        "--seed", "1", "--output", str(prior),
    ])
    assert rc == 0
    pr = pd.read_csv(prior, sep="\t")
    assert len(pr) == 80 and np.isfinite(pr["y"]).all()

    post = tmp_path / "post.tsv"
    rc = main([
        "--platform", "cpu", "sample", "y ~| SqExp(:x; l=1.5) + Cat(:g)",
        "--data", str(prior), "--at", "x=-5:1:5; g=0",
        "--approx", "rff", "--rff-features", "128",
        "--seed", "2", "--output", str(post),
    ])
    assert rc == 0
    po = pd.read_csv(post, sep="\t")
    assert len(po) == 11 and np.isfinite(po["y"]).all()


def test_fitplot_lowrank_components_match_dense(tmp_path):
    """fitplot's per-component posterior via the feature path equals the
    dense decomposition on a finite-rank formula (feature AND bare-Noise
    diag terms), and the CLI runs end-to-end."""
    import argparse

    from gaplac_tpu.cli.fitplot_cmd import _lowrank_component_stats, term_gram
    from gaplac_tpu.ops import linalg

    ck = _compiled("Linear(:x) + Cat(:g) + Noise(s2=0.4)")
    n = 30
    X = jnp.asarray(_data(ck, n, seed=21))
    y = jnp.asarray(np.random.default_rng(22).standard_normal(n))
    params = ck.default_params(X.dtype)
    noise = 1.1
    args = argparse.Namespace(rff_features=8, rff_seed=0, approx="rff")
    stats = _lowrank_component_stats(args, ck, params, X, y, noise)

    S = ck.gram(params, X) + noise * jnp.eye(n, dtype=X.dtype)
    L = linalg.cholesky(S)
    alpha = linalg.solve_triangular(
        L.T, linalg.solve_triangular(L, y, lower=True), lower=False
    )
    for t in range(len(ck.terms)):
        Kt = term_gram(ck, t, params, X)
        mu_d = Kt @ alpha
        V = linalg.solve_triangular(L, Kt, lower=True)
        var_d = jnp.diag(Kt) - jnp.sum(V * V, axis=0)
        mu_l, var_l = stats(t)
        np.testing.assert_allclose(np.asarray(mu_l), np.asarray(mu_d),
                                   rtol=1e-7, atol=1e-9, err_msg=f"term {t} mean")
        np.testing.assert_allclose(np.asarray(var_l), np.asarray(var_d),
                                   rtol=1e-7, atol=1e-9, err_msg=f"term {t} var")

    # CLI end-to-end
    import pandas as pd

    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(23)
    data = tmp_path / "d.tsv"
    pd.DataFrame({
        "x": rng.uniform(-3, 3, 40), "g": rng.integers(0, 3, 40).astype(float),
        "y": rng.standard_normal(40),
    }).to_csv(data, sep="\t", index=False)
    out = tmp_path / "fit.png"
    rc = main([
        "--platform", "cpu", "fitplot", "y ~| Linear(:x) + Cat(:g)",
        "--data", str(data), "--approx", "rff", "--rff-features", "8",
        "-o", str(out),
    ])
    assert rc == 0 and out.exists()


def test_cli_mcmc_chees_rff_composes(tmp_path):
    """--sampler chees + --approx rff: the TPU-native sampler runs on the
    low-rank marginal (8 lockstep chains, sharded over the CPU mesh)."""
    import pandas as pd

    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(9)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": rng.uniform(-5, 5, 40),
                  "y": np.sin(rng.uniform(-5, 5, 40))}).to_csv(
        data, sep="\t", index=False)
    out = tmp_path / "c.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", str(data),
        "--infer", "x", "--samples", "15", "--warmup", "30",
        "--sampler", "chees", "--chains", "8",
        "--approx", "rff", "--rff-features", "64", "--no-latents",
        "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert df["chain"].nunique() == 8
    assert np.isfinite(df["lp"]).all() and np.isfinite(df["ℓ"]).all()
