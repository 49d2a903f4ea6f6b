"""Exact state-space (parallel-Kalman) path for OU formulas (--approx sde).

ops/markov.py must match the dense MVN marginal / GP regression to floating
point (same math, O(n log n) associative scans instead of O(n^3) Cholesky),
and the model/CLI wiring must reproduce the dense path's numbers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.inference.model import build_model
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import markov, mvn


def _dense_K(t, ell):
    d = jnp.abs(t[:, None] - t[None, :])
    return jnp.exp(-d / ell)


@pytest.mark.parametrize("n,ell,R", [(7, 1.3, 0.5), (60, 0.4, 1.1), (200, 3.0, 0.1)])
def test_loglik_matches_dense(n, ell, R):
    rng = np.random.default_rng(n)
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.asarray(rng.standard_normal(n))
    lp_dense = float(mvn.mvn_logpdf(_dense_K(t, ell) + R * jnp.eye(n), y))
    lp_ss = float(markov.ou_loglik(t, y, ell, R))
    assert abs(lp_dense - lp_ss) < 1e-8 * max(1.0, abs(lp_dense))


def test_loglik_duplicate_times_and_grad():
    rng = np.random.default_rng(3)
    t = jnp.asarray(np.sort(np.concatenate([[1.0, 1.0, 2.0, 2.0],
                                            rng.uniform(0, 5, 6)])))
    y = jnp.asarray(rng.standard_normal(10))
    lp_dense = float(mvn.mvn_logpdf(_dense_K(t, 0.7) + 0.3 * jnp.eye(10), y))
    assert abs(lp_dense - float(markov.ou_loglik(t, y, 0.7, 0.3))) < 1e-9
    g_ss = float(jax.grad(lambda l: markov.ou_loglik(t, y, l, 0.3))(0.7))
    g_d = float(jax.grad(
        lambda l: mvn.mvn_logpdf(_dense_K(t, l) + 0.3 * jnp.eye(10), y))(0.7))
    assert abs(g_ss - g_d) < 1e-8


def test_smooth_and_predict_match_dense():
    rng = np.random.default_rng(1)
    n, m, ell, R = 40, 15, 1.1, 0.4
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.asarray(rng.standard_normal(n))
    tn = jnp.asarray(np.sort(rng.uniform(-1, 11, m)))
    K = _dense_K(t, ell)
    sol = jnp.linalg.solve(K + R * jnp.eye(n), y)
    m_s, P_s = markov.ou_smooth(t, y, ell, R)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(K @ sol), atol=1e-9)
    P_d = jnp.diag(K - K @ jnp.linalg.solve(K + R * jnp.eye(n), K))
    np.testing.assert_allclose(np.asarray(P_s), np.asarray(P_d), atol=1e-9)
    Ktx = jnp.exp(-jnp.abs(tn[:, None] - t[None, :]) / ell)
    mu_d = Ktx @ sol
    A = jnp.linalg.solve(K + R * jnp.eye(n), Ktx.T)
    var_d = 1.0 - jnp.sum(Ktx * A.T, axis=1)
    mu_s, var_s = markov.ou_posterior_predict(t, y, ell, R, tn)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d), atol=1e-9)


def test_prior_sample_covariance():
    rng = np.random.default_rng(4)
    t = jnp.asarray(np.sort(rng.uniform(0, 5, 12)))
    keys = jax.random.split(jax.random.key(0), 4000)
    xs = np.asarray(jax.vmap(lambda k: markov.ou_prior_sample(k, t, 1.3))(keys))
    emp = np.cov(xs.T)
    Kp = np.exp(-np.abs(np.asarray(t)[:, None] - np.asarray(t)[None, :]) / 1.3)
    assert np.abs(emp - Kp).max() < 0.08  # MC error at 4000 paths


def test_model_logdensity_matches_dense():
    """build_model(approx='sde') must equal the dense marginalized model's
    logdensity pointwise — same math, different algorithm.  Includes an
    inferred bare-Noise term (shared slot group with the OU lengthscale is
    the reference's --infer semantics, so use pervar groups here)."""
    rng = np.random.default_rng(7)
    n = 50
    x = np.sort(rng.uniform(0, 10, n))
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(np.sin(x) + rng.normal(0, 0.5, n))
    spec = parse_formula("y ~| OU(:x) + Noise")
    ck = compile_formula(spec.formula)
    m_sde = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
    m_dense = build_model(ck, ["x"], X, y, spec.likelihood)
    for seed in range(5):
        u = jax.random.uniform(jax.random.key(seed), (m_sde.dim,), minval=-2.0,
                               maxval=2.0)
        a = float(m_sde.logdensity(u))
        b = float(m_dense.logdensity(u))
        assert abs(a - b) < 1e-7 * max(1.0, abs(b))
        ga = np.asarray(jax.grad(m_sde.logdensity)(u))
        gb = np.asarray(jax.grad(m_dense.logdensity)(u))
        np.testing.assert_allclose(ga, gb, rtol=1e-6, atol=1e-8)


def test_model_report_latents_match_posterior_mean():
    """The Matheron latent draw in report(): the MEAN over many draws at
    fixed theta must equal the exact posterior mean (within MC error), and
    the fx ordering must match the ORIGINAL (unsorted) row order."""
    rng = np.random.default_rng(9)
    n = 30
    x = rng.uniform(0, 8, n)  # deliberately unsorted
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(np.sin(x) + rng.normal(0, 0.4, n))
    spec = parse_formula("y ~| OU(:x)")
    ck = compile_formula(spec.formula)
    m = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
    u = m.position_from(jnp.asarray([1.3]), None)
    keys = jax.random.split(jax.random.key(1), 3000)
    _, fs, lps = jax.vmap(lambda k: m.report(k, u))(keys)
    assert np.isfinite(np.asarray(lps)).all()
    # exact posterior mean of f = S T^-1 y in ORIGINAL order
    t = jnp.asarray(x)
    K = _dense_K(t, 1.3)
    S = K + 0.1 * jnp.eye(n)
    mean_f = S @ jnp.linalg.solve(S + 1.0 * jnp.eye(n), y)
    err = np.abs(np.asarray(fs).mean(axis=0) - np.asarray(mean_f))
    assert err.max() < 0.12  # MC error at 3000 draws


def _kfun(kind, param):
    from gaplac_tpu.ops import markov_ss as ss

    d = lambda a, b: jnp.abs(a[:, None] - b[None, :])
    if kind == 0:  # OU
        return lambda t: jnp.exp(-d(t, t) / param)
    if kind == 1:  # Matern32
        lam = 3.0 ** 0.5 / param
        return lambda t: (1 + lam * d(t, t)) * jnp.exp(-lam * d(t, t))
    if kind == 2:  # Matern52
        lam = 5.0 ** 0.5 / param
        return lambda t: (1 + lam * d(t, t) + lam ** 2 * d(t, t) ** 2 / 3.0) \
            * jnp.exp(-lam * d(t, t))
    if kind == 3:  # Constant
        return lambda t: param * jnp.ones((t.shape[0], t.shape[0]))
    if kind == 4:  # Linear
        return lambda t: t[:, None] * t[None, :] + param


@pytest.mark.parametrize("kind,param", [(0, 1.3), (1, 0.9), (2, 1.7),
                                        (3, 0.7), (4, 0.5)])
def test_ss_block_loglik_matches_dense(kind, param):
    from gaplac_tpu.ops import markov_ss as ss

    rng = np.random.default_rng(kind)
    n, R = 35, 0.4
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.asarray(rng.standard_normal(n))
    xs = [t if kind == ss.BLOCK_LINEAR else None]
    A, Q, H = ss.build_steps([kind], [param], t, xs)
    lp = float(ss.ss_loglik(A, Q, H, y, R))
    lp_d = float(mvn.mvn_logpdf(_kfun(kind, param)(t) + R * jnp.eye(n), y))
    assert abs(lp - lp_d) < 1e-8 * max(1.0, abs(lp_d))


def test_ss_smooth_and_predict_match_dense():
    from gaplac_tpu.ops import markov_ss as ss

    rng = np.random.default_rng(0)
    n, m, R = 40, 12, 0.4
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.asarray(rng.standard_normal(n))
    tn = jnp.asarray(np.sort(rng.uniform(-1, 11, m)))
    kinds = [ss.BLOCK_M32, ss.BLOCK_LINEAR, ss.BLOCK_CONST]
    params = [0.9, 0.5, 0.7]
    kf = lambda a: sum(_kfun(k, p)(a) for k, p in zip(kinds, params))
    lam = 3.0 ** 0.5 / 0.9
    d = lambda a, b: jnp.abs(a[:, None] - b[None, :])
    kxf = lambda a, b: ((1 + lam * d(a, b)) * jnp.exp(-lam * d(a, b))
                        + a[:, None] * b[None, :] + 0.5 + 0.7)
    Kxx = kxf(t, t)
    sol = jnp.linalg.solve(Kxx + R * jnp.eye(n), jnp.eye(n))
    A, Q, H = ss.build_steps(kinds, params, t, [None, t, None])
    m_s, _ = ss.ss_smooth(A, Q, H, y, R)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nd,nd->n", H, m_s)),
        np.asarray(Kxx @ sol @ y), atol=1e-9,
    )
    Ktx = kxf(tn, t)
    mu_d = Ktx @ sol @ y
    var_d = jnp.diag(kxf(tn, tn)) - jnp.einsum("md,de,me->m", Ktx, sol, Ktx)
    mu_s, var_s = ss.ss_predict(kinds, params, t, [None, t, None], y, R, tn,
                                [None, tn, None])
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d), atol=1e-8)


def test_sde_rejects_unsupported_formulas():
    X = jnp.asarray(np.linspace(0, 1, 10)[:, None])
    y = jnp.zeros(10)
    for f, msg in [
        ("y ~| OU(:x) * Noise", "product"),
        ("y ~| Noise(:x) * Cat(:x)", "Noise"),
    ]:
        spec = parse_formula(f)
        with pytest.raises(ValueError, match=msg):
            build_model(compile_formula(spec.formula), ["x"], X, y,
                        spec.likelihood, approx="sde")
    # two Markov leaves on DIFFERENT columns: no shared time axis
    spec = parse_formula("y ~| OU(:x) + Matern32(:t)")
    X2 = jnp.asarray(np.column_stack([np.linspace(0, 1, 10),
                                      np.linspace(2, 3, 10)]))
    with pytest.raises(ValueError, match="shared column"):
        build_model(compile_formula(spec.formula), ["x"], X2, y,
                    spec.likelihood, approx="sde")


def test_model_logdensity_matches_dense_matrix_state():
    """The matrix-state path (Matern32 + Matern52 + OU + Linear + Constant
    + Noise sum) must equal the dense marginalized model pointwise in value
    and gradient — the full block-diagonal exactness check."""
    rng = np.random.default_rng(12)
    n = 40
    x = np.sort(rng.uniform(0, 10, n))
    # one design column per leaf occurrence (reference column semantics)
    X = jnp.asarray(np.repeat(x[:, None], 4, axis=1))
    y = jnp.asarray(np.sin(x) + rng.normal(0, 0.5, n))
    spec = parse_formula(
        "y ~| OU(:x) + Matern32(:x) + Matern52(:x) + Linear(:x) + Constant(0.7) + Noise"
    )
    ck = compile_formula(spec.formula)
    m_sde = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
    m_dense = build_model(ck, ["x"], X, y, spec.likelihood)
    for seed in range(4):
        u = jax.random.uniform(jax.random.key(seed), (m_sde.dim,), minval=-1.5,
                               maxval=1.5)
        a = float(m_sde.logdensity(u))
        b = float(m_dense.logdensity(u))
        assert abs(a - b) < 1e-6 * max(1.0, abs(b))
        ga = np.asarray(jax.grad(m_sde.logdensity)(u))
        gb = np.asarray(jax.grad(m_dense.logdensity)(u))
        np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-7)
    # double-OU on one column also works (2-dim state)
    spec2 = parse_formula("y ~| OU(:x; l=0.5) + OU(:x; l=4.0)")
    ck2 = compile_formula(spec2.formula)
    m2 = build_model(ck2, ["x"], X, y, spec2.likelihood, approx="sde",
                     shared_hyper=False)
    m2d = build_model(ck2, ["x"], X, y, spec2.likelihood, shared_hyper=False)
    u = jnp.asarray([0.3, -0.4])
    assert abs(float(m2.logdensity(u)) - float(m2d.logdensity(u))) < 1e-7


def test_cli_sde_matrix_predict_matches_dense(tmp_path):
    """predict --approx sde on a Matern32 + Linear formula reproduces the
    dense predict table (matrix-state smoother path through the CLI)."""
    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(8)
    n = 35
    x = np.sort(rng.uniform(0, 10, n))
    y = np.sin(x) + 0.1 * x + rng.normal(0, 0.4, n)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": y}).to_csv(data, sep="\t", index=False)
    outs = {}
    for mode in ("none", "sde"):
        out = tmp_path / f"pred_{mode}.tsv"
        rc = main([
            "--platform", "cpu", "predict", "y ~| Matern32(:x) + Linear(:x)",
            "--data", str(data), "--at", "x=0:0.5:10", "--approx", mode,
            "--output", str(out), "--seed", "0",
        ])
        assert rc == 0
        outs[mode] = pd.read_csv(out, sep="\t")
    for col in ("ymu", "yQ050", "yQ950"):
        np.testing.assert_allclose(outs["sde"][col], outs["none"][col],
                                   rtol=1e-6, atol=1e-7)


def test_cli_sde_end_to_end(tmp_path):
    """mcmc/select/predict with --approx sde; predict output must match the
    dense predict to floating point (both deterministic without --mcmc)."""
    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(5)
    n = 40
    x = np.sort(rng.uniform(0, 10, n))
    y = np.sin(x) + rng.normal(0, 0.5, n)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": y}).to_csv(data, sep="\t", index=False)

    chain = tmp_path / "chain.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| OU(:x)", "--data", str(data),
        "--infer", "x", "--samples", "40", "--warmup", "100",
        "--approx", "sde", "--seed", "2", "--output", str(chain),
    ])
    assert rc == 0
    cdf = pd.read_csv(chain, sep="\t")
    assert "ℓ" in cdf.columns and "lp" in cdf.columns
    assert np.isfinite(cdf["lp"]).all()

    rc = main([
        "--platform", "cpu", "select",
        "--formulae", "y ~| OU(:x; l=1)", "y ~| OU(:x; l=5)",
        "--data", str(data), "--approx", "sde",
    ])
    assert rc == 0

    outs = {}
    for mode in ("none", "sde"):
        out = tmp_path / f"pred_{mode}.tsv"
        rc = main([
            "--platform", "cpu", "predict", "y ~| OU(:x)", "--data", str(data),
            "--at", "x=0:0.5:10", "--approx", mode, "--output", str(out),
            "--seed", "0",
        ])
        assert rc == 0
        outs[mode] = pd.read_csv(out, sep="\t")
    for col in ("ymu", "yQ050", "yQ950"):
        np.testing.assert_allclose(outs["sde"][col], outs["none"][col],
                                   rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# Markov × Cat: per-group independent state-space chains (VERDICT r2 task 2)
# ---------------------------------------------------------------------------


def test_grouped_markov_matches_dense():
    """OU(:t)*Cat(:g) + Cat(:g) + Noise — the longitudinal core formula
    (per-subject OU + subject random intercept) must match the dense
    marginal pointwise in value and gradient."""
    rng = np.random.default_rng(21)
    n = 120
    g = rng.integers(0, 7, n).astype(float)
    t = rng.uniform(0, 10, n)
    spec = parse_formula("y ~| OU(:t)*Cat(:g) + Cat(:g) + Noise")
    ck = compile_formula(spec.formula)
    X = jnp.asarray(np.stack([t, g, g], axis=1))
    y = jnp.asarray(rng.normal(0, 1, n))
    m_sde = build_model(ck, ["t"], X, y, spec.likelihood, approx="sde")
    m_dense = build_model(ck, ["t"], X, y, spec.likelihood)
    for seed in range(4):
        u = jax.random.uniform(jax.random.key(seed), (m_sde.dim,),
                               minval=-1.5, maxval=1.5)
        a, b = float(m_sde.logdensity(u)), float(m_dense.logdensity(u))
        assert abs(a - b) < 1e-7 * max(1.0, abs(b))
        ga = np.asarray(jax.grad(m_sde.logdensity)(u))
        gb = np.asarray(jax.grad(m_dense.logdensity)(u))
        np.testing.assert_allclose(ga, gb, rtol=1e-6, atol=1e-8)


def test_legacy_composite_sde_matches_dense():
    """The reference's legacy composite Cat(a)*Cat(b) + Cat(a) + Linear(z)
    + Noise (test/pred.jl:3) — all-static blocks with nested group resets —
    must match the dense marginal."""
    rng = np.random.default_rng(22)
    n = 130
    a = rng.integers(0, 6, n).astype(float)
    b = rng.integers(0, 3, n).astype(float)
    z = rng.uniform(-2, 2, n)
    spec = parse_formula("y ~| Cat(:a)*Cat(:b) + Cat(:a) + Linear(:z) + Noise")
    ck = compile_formula(spec.formula)
    X = jnp.asarray(np.stack([a, b, a, z], axis=1))
    y = jnp.asarray(rng.normal(0, 1, n))
    m_sde = build_model(ck, ["z"], X, y, spec.likelihood, approx="sde")
    m_dense = build_model(ck, ["z"], X, y, spec.likelihood)
    for seed in range(3):
        u = jax.random.uniform(jax.random.key(seed), (1,), minval=-1.5,
                               maxval=1.5)
        x1, x2 = float(m_sde.logdensity(u)), float(m_dense.logdensity(u))
        assert abs(x1 - x2) < 1e-7 * max(1.0, abs(x2))


def test_grouped_markov_report_latents():
    """Matheron latent draws under grouping: mean over draws must equal the
    exact posterior mean in ORIGINAL row order."""
    rng = np.random.default_rng(23)
    n = 40
    g = rng.integers(0, 4, n).astype(float)
    t = rng.uniform(0, 8, n)
    spec = parse_formula("y ~| Matern32(:t)*Cat(:g)")
    ck = compile_formula(spec.formula)
    X = jnp.asarray(np.stack([t, g], axis=1))
    y = jnp.asarray(rng.normal(0, 1, n))
    m = build_model(ck, ["t"], X, y, spec.likelihood, approx="sde")
    u = m.position_from(jnp.asarray([1.1]), None)
    keys = jax.random.split(jax.random.key(2), 3000)
    _, fs, lps = jax.vmap(lambda k: m.report(k, u))(keys)
    assert np.isfinite(np.asarray(lps)).all()
    lam = 3.0 ** 0.5 / 1.1
    dd = np.abs(t[:, None] - t[None, :])
    K = (1 + lam * dd) * np.exp(-lam * dd) * (g[:, None] == g[None, :])
    S = K + 0.1 * np.eye(n)
    mean_f = S @ np.linalg.solve(S + np.eye(n), np.asarray(y))
    err = np.abs(np.asarray(fs).mean(axis=0) - mean_f)
    assert err.max() < 0.15  # MC error at 3000 draws


def test_grouped_predict_matches_dense(tmp_path):
    """predict --approx sde with a grouped formula reproduces the dense
    predict table (reset-based smoother on the joined train+test rows)."""
    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(24)
    n = 60
    g = np.repeat(np.arange(5), 12).astype(float)
    t = np.concatenate([np.sort(rng.uniform(0, 10, 12)) for _ in range(5)])
    y = np.sin(t) + 0.5 * g + rng.normal(0, 0.4, n)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"t": t, "g": g, "y": y}).to_csv(data, sep="\t", index=False)
    outs = {}
    for mode in ("none", "sde"):
        out = tmp_path / f"pred_{mode}.tsv"
        rc = main([
            "--platform", "cpu", "predict",
            "y ~| OU(:t)*Cat(:g) + Cat(:g) + Noise",
            "--data", str(data), "--at", "t=0:0.5:10; g=2", "--approx", mode,
            "--output", str(out), "--seed", "0",
        ])
        assert rc == 0
        outs[mode] = pd.read_csv(out, sep="\t")
    for col in ("ymu", "yQ050", "yQ950"):
        np.testing.assert_allclose(outs["sde"][col], outs["none"][col],
                                   rtol=1e-6, atol=1e-7)


def test_crossed_grouping_rejected():
    """Crossed groupings (no nesting) have no exact Markov form → clear
    error pointing at the dense/rff fallback."""
    rng = np.random.default_rng(25)
    n = 40
    t = np.sort(rng.uniform(0, 10, n))
    a = rng.integers(0, 4, n).astype(float)
    b = rng.integers(0, 3, n).astype(float)
    spec = parse_formula("y ~| OU(:t)*Cat(:a) + Cat(:b)")
    ck = compile_formula(spec.formula)
    X = jnp.asarray(np.stack([t, a, b], axis=1))
    y = jnp.zeros(n)
    with pytest.raises(ValueError, match="contiguous"):
        build_model(ck, ["t"], X, y, spec.likelihood, approx="sde")


def test_reference_fixture_grouped_sde():
    """The real 921-row reference fixture (test/pred.jl:3): both the legacy
    composite and the longitudinal OU-per-person formula match the dense
    marginal to float tolerance through the state-space path."""
    import os

    TESTIN = "/root/reference/test/testin"
    if not os.path.isdir(TESTIN):
        pytest.skip("reference fixtures not mounted")
    from gaplac_tpu.cli.common import design_matrix

    data = pd.read_csv(os.path.join(TESTIN, "input_pair_109.tsv"), sep="\t")
    for formula, infer in [
        ("bug :~| Cat(PersonID) * Cat(StoolPairs) + Cat(PersonID) "
         "+ Linear(nutrient) + Noise", "nutrient"),
        ("bug :~| OU(Date) * Cat(PersonID) + Cat(PersonID) + Noise", "Date"),
    ]:
        spec = parse_formula(formula)
        ck = compile_formula(spec.formula)
        X = jnp.asarray(design_matrix(data, ck))
        y = jnp.asarray(data["bug"].to_numpy())
        m_sde = build_model(ck, [infer], X, y, spec.likelihood, approx="sde")
        m_dense = build_model(ck, [infer], X, y, spec.likelihood)
        u = jnp.asarray([0.4])
        a, b = float(m_sde.logdensity(u)), float(m_dense.logdensity(u))
        assert abs(a - b) < 1e-6 * max(1.0, abs(b)), formula


# ---------------------------------------------------------------------------
# sample / fitplot --approx sde (VERDICT r2 task 3: 5/5 commands)
# ---------------------------------------------------------------------------


def test_sde_prior_draw_covariance():
    """sample's state-space prior draw: empirical covariance over draws must
    match gram + jitter·I (incl. Cat grouping and a Noise term)."""
    from gaplac_tpu.cli.sample_cmd import _sde_prior_draw

    rng = np.random.default_rng(31)
    n = 25
    g = rng.integers(0, 3, n).astype(float)
    t = rng.uniform(0, 6, n)
    ck = compile_formula(
        parse_formula("y ~| OU(:t)*Cat(:g) + Cat(:g) + Noise").formula)
    X = np.stack([t, g, g], 1)
    p = ck.default_params()
    keys = jax.random.split(jax.random.key(0), 6000)
    fs = np.asarray(jax.vmap(
        lambda k: _sde_prior_draw(ck, X, p, k, jnp.float64, 0.1))(keys))
    Kd = np.asarray(ck.gram(p, jnp.asarray(X))) + 0.1 * np.eye(n)
    assert np.abs(np.cov(fs.T) - Kd).max() < 0.2  # MC error at 6000 draws


def test_sde_posterior_draw_moments():
    """sample --data: the Matheron joined-smoother draw must have the dense
    GP posterior's mean and covariance (within MC error)."""
    from gaplac_tpu.cli.sample_cmd import _sde_posterior_draw

    rng = np.random.default_rng(32)
    n, m = 25, 15
    g = rng.integers(0, 3, n).astype(float)
    t = rng.uniform(0, 6, n)
    ck = compile_formula(
        parse_formula("y ~| OU(:t)*Cat(:g) + Cat(:g) + Noise").formula)
    X = np.stack([t, g, g], 1)
    Xt = np.stack([np.linspace(0, 6, m), np.full(m, 1.0), np.full(m, 1.0)], 1)
    p = ck.default_params()
    y = jnp.asarray(rng.normal(0, 1, n))
    keys = jax.random.split(jax.random.key(1), 6000)
    fp = np.asarray(jax.vmap(lambda k: _sde_posterior_draw(
        ck, X, Xt, y, p, k, jnp.float64, 0.1, 1.0))(keys))
    Kd = np.asarray(ck.gram(p, jnp.asarray(X))) + 0.1 * np.eye(n)
    Ktx = np.asarray(ck.gram(p, jnp.asarray(Xt), jnp.asarray(X)))
    mu_d = Ktx @ np.linalg.solve(Kd + np.eye(n), np.asarray(y))
    assert np.abs(fp.mean(0) - mu_d).max() < 0.1
    Ktt = np.asarray(ck.gram(p, jnp.asarray(Xt))) + 0.1 * np.eye(m)
    cov_d = Ktt - Ktx @ np.linalg.solve(Kd + np.eye(n), Ktx.T)
    assert np.abs(np.cov(fp.T) - cov_d).max() < 0.15


def test_sde_fitplot_components_match_dense():
    """fitplot --approx sde: per-component posterior stats from the masked-H
    smoother equal the dense K_t S^{-1} formulas to float tolerance."""
    from types import SimpleNamespace

    from gaplac_tpu.cli.fitplot_cmd import _sde_component_stats, term_gram

    rng = np.random.default_rng(33)
    n = 30
    g = rng.integers(0, 3, n).astype(float)
    t = rng.uniform(0, 6, n)
    ck = compile_formula(
        parse_formula("y ~| Matern52(:t)*Cat(:g) + Linear(:t) + Noise").formula)
    X = jnp.asarray(np.stack([t, g, t], 1))
    p = ck.default_params()
    y = jnp.asarray(rng.normal(0, 1, n))
    args = SimpleNamespace(jitter=0.1)
    cs = _sde_component_stats(args, ck, p, X, y, 0.1 + 1.0)
    S = np.asarray(ck.gram(p, X)) + (0.1 + 1.0) * np.eye(n)
    Sinv = np.linalg.inv(S)
    alpha = Sinv @ np.asarray(y)
    for ti in range(len(ck.terms)):
        Kt = np.asarray(term_gram(ck, ti, p, X))
        mu_d = Kt @ alpha
        var_d = np.diag(Kt) - np.einsum("ij,jk,ik->i", Kt, Sinv, Kt)
        mu_s, var_s = cs(ti)
        np.testing.assert_allclose(np.asarray(mu_s), mu_d, atol=1e-9)
        np.testing.assert_allclose(np.asarray(var_s), var_d, atol=1e-9)


def test_cli_sample_fitplot_sde(tmp_path):
    """sample + fitplot run end-to-end with --approx sde through the CLI
    (prior draw table; per-component plot file)."""
    from gaplac_tpu.cli.main import main

    out = tmp_path / "prior.tsv"
    rc = main([
        "--platform", "cpu", "sample", "y :~| OU(:t; l=1.5) + Noise",
        "--at", "t = rand(Uniform(0,10), 80)", "--approx", "sde",
        "--seed", "3", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert "y" in df.columns and len(df) == 80 and np.isfinite(df["y"]).all()

    data = tmp_path / "d.tsv"
    df.to_csv(data, sep="\t", index=False)
    png = tmp_path / "fit.png"
    rc = main([
        "--platform", "cpu", "fitplot", "y ~| OU(:t) + Noise",
        "--data", str(data), "--approx", "sde", "--output", str(png),
    ])
    assert rc == 0 and png.exists()

    # posterior sample at new points, grouped formula
    out2 = tmp_path / "post.tsv"
    rc = main([
        "--platform", "cpu", "sample", "y :~| OU(:t) + Noise",
        "--data", str(data), "--at", "t=0:0.5:10", "--approx", "sde",
        "--seed", "4", "--output", str(out2),
    ])
    assert rc == 0
    df2 = pd.read_csv(out2, sep="\t")
    assert np.isfinite(df2["y"]).all()


# ---------------------------------------------------------------------------
# SqExp spectral-Taylor SSM block (VERDICT r2 task 6)
# ---------------------------------------------------------------------------


def test_sqexp_ssm_kernel_error_bound():
    """The order-6 modal SE block reproduces exp(-d²/2l²) within the
    measured truncation envelope (max |Δk| = 4.3e-3 at l=1; scale-free)."""
    from gaplac_tpu.ops import markov_ss as ss

    modes, Pz, h = ss._sqexp_constants_cached()
    assert sum(2 if b is not None else 1 for _, b in modes) == ss.SQEXP_ORDER
    t = jnp.asarray(np.linspace(0, 8, 300))
    A, Q, H = ss.build_steps([ss.BLOCK_SQEXP], [2.0], t, [None])
    # covariance vs first row: k(t_j, t_0) = H_j (Π A) P∞ H_0ᵀ — read it
    # off a smoothing-free product by propagating P∞ columns
    def prop(carry, AH):
        Ai, Hi = AH
        carry = Ai @ carry
        return carry, Hi @ carry
    P0 = jnp.asarray(Pz)
    _, kvals = jax.lax.scan(prop, P0, (A[1:], H[1:]))
    k_row = kvals @ jnp.asarray(h)        # k(t_j, t_0), j = 1..
    d = np.asarray(t[1:] - t[0])
    k_true = np.exp(-d * d / (2.0 * 4.0))
    assert np.abs(np.asarray(k_row) - k_true).max() < 6e-3


def test_sqexp_sde_lp_error_and_grad():
    """SqExp --approx sde marginal vs dense: |Δlp| within the measured
    envelope (≤0.2 nats at n=200 for l ≤ 2; ≤1.5 through l=20), and the
    guide's flagship formula runs grouped too."""
    rng = np.random.default_rng(50)
    n = 200
    x = np.sort(rng.uniform(0, 10, n))
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(np.sin(x) + rng.normal(0, 0.5, n))
    spec = parse_formula("y ~| SqExp(:x)")
    ck = compile_formula(spec.formula)
    ms = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
    md = build_model(ck, ["x"], X, y, spec.likelihood)
    for ell, tol in [(0.3, 0.3), (0.7, 0.3), (1.5, 0.3), (2.0, 0.3),
                     (5.0, 1.5), (15.0, 1.5)]:
        u = ms.position_from(jnp.asarray([ell]), None)
        a, b = float(ms.logdensity(u)), float(md.logdensity(u))
        assert abs(a - b) < tol, (ell, a - b)
    # gradients stay directionally consistent at guide lengthscales
    u = ms.position_from(jnp.asarray([1.5]), None)
    ga = float(jax.grad(ms.logdensity)(u)[0])
    gb = float(jax.grad(md.logdensity)(u)[0])
    assert abs(ga - gb) < 0.05 * max(1.0, abs(gb))

    # grouped SqExp×Cat compiles and stays within the same envelope
    g = rng.integers(0, 5, n).astype(float)
    specg = parse_formula("y ~| SqExp(:x)*Cat(:g) + Noise")
    ckg = compile_formula(specg.formula)
    Xg = jnp.asarray(np.stack([x, g], 1))
    mg = build_model(ckg, ["x"], Xg, y, specg.likelihood, approx="sde")
    mgd = build_model(ckg, ["x"], Xg, y, specg.likelihood)
    u = mg.position_from(jnp.asarray([1.5]), None)
    assert abs(float(mg.logdensity(u)) - float(mgd.logdensity(u))) < 0.5


def test_sqexp_sde_posterior_parity():
    """mcmc --approx sde on the guide formula recovers the same posterior
    as the dense path within MC error (the guide workflow at O(n log n))."""
    from gaplac_tpu.inference.nuts import run_nuts

    rng = np.random.default_rng(51)
    n = 50
    x = np.sort(rng.uniform(-5, 5, n))
    X = jnp.asarray(x[:, None])
    d2 = (x[:, None] - x[None, :]) ** 2
    K = np.exp(-d2 / (2 * 1.5 ** 2))
    y = jnp.asarray(np.linalg.cholesky(K + 0.1 * np.eye(n))
                    @ rng.standard_normal(n))
    spec = parse_formula("y ~| SqExp(:x)")
    ck = compile_formula(spec.formula)
    meds = {}
    for mode in ("sde", "exact"):
        m = build_model(ck, ["x"], X, y, spec.likelihood, approx=mode)
        # 3 vmapped chains, ONE compile (single-chain medians carry ±1.3
        # MC error; pooling tightens without tripling compile time)
        q0 = jax.vmap(m.initial_position)(
            jax.random.split(jax.random.key(9), 3))
        res = jax.jit(jax.vmap(lambda k, q: run_nuts(
            k, m.logdensity, q, 200, num_warmup=250)))(
                jax.random.split(jax.random.key(10), 3), q0)
        ells = np.asarray(jax.vmap(jax.vmap(m.constrain))(res.positions))
        meds[mode] = np.median(ells.reshape(-1))
    assert abs(meds["sde"] - meds["exact"]) < 2.0, meds


def test_periodic_sde_accuracy():
    """Periodic --approx sde (J-harmonic Fourier-series SSM): effectively
    exact for l >= 0.4 (measured: |Δlp| <= 5e-3 at n=150), degrading below
    (l=0.3: ~0.11); dynamic period (--infer-extra) exact to fp; grouped
    Periodic×Cat exact."""
    rng = np.random.default_rng(60)
    n = 150
    x = np.sort(rng.uniform(0, 10, n))
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(np.sin(2 * np.pi * x / 3.0) + rng.normal(0, 0.3, n))
    spec = parse_formula("y ~| Periodic(:x; p=3.0)")
    ck = compile_formula(spec.formula)
    ms = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
    md = build_model(ck, ["x"], X, y, spec.likelihood)
    for ell, tol in [(0.4, 0.02), (0.7, 1e-4), (1.5, 1e-6), (3.0, 1e-6)]:
        u = ms.position_from(jnp.asarray([ell]), None)
        assert abs(float(ms.logdensity(u)) - float(md.logdensity(u))) < tol

    # dynamic period via --infer-extra (dim 2: l, p) — machine precision
    m2 = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde",
                     infer_extras=["x"])
    m2d = build_model(ck, ["x"], X, y, spec.likelihood, infer_extras=["x"])
    u = jnp.asarray([0.4, -0.9])
    assert abs(float(m2.logdensity(u)) - float(m2d.logdensity(u))) < 1e-8
    ga = np.asarray(jax.grad(m2.logdensity)(u))
    gb = np.asarray(jax.grad(m2d.logdensity)(u))
    np.testing.assert_allclose(ga, gb, rtol=1e-6, atol=1e-8)

    # grouped Periodic×Cat
    g = rng.integers(0, 4, n).astype(float)
    specg = parse_formula("y ~| Periodic(:x; p=3.0)*Cat(:g) + Noise")
    ckg = compile_formula(specg.formula)
    Xg = jnp.asarray(np.stack([x, g], 1))
    mg = build_model(ckg, ["x"], Xg, y, specg.likelihood, approx="sde")
    mgd = build_model(ckg, ["x"], Xg, y, specg.likelihood)
    u = jnp.asarray([0.5])
    assert abs(float(mg.logdensity(u)) - float(mgd.logdensity(u))) < 1e-8


def test_product_sde_matches_dense():
    """Multi-factor product terms lower to the Kronecker-composed SSM
    (ops/markov_ss.py::_block_APH product branch): A = ⊗A_i, P∞ = ⊗P_i,
    H = ⊗H_i — EXACT for products of exact factor blocks, since the
    composite covariance H A(Δ) P∞ Hᵀ factorizes into Π H_i A_i(Δ) P_i H_iᵀ.
    Value AND gradient parity vs the dense marginal (the reference composes
    products via AbstractGPs kernel multiplication, src/gplac.jl)."""
    rng = np.random.default_rng(3)
    n = 60
    x = np.sort(rng.uniform(0, 10, n))
    X = jnp.asarray(np.stack([x, x], 1))  # one design column per leaf
    y = jnp.asarray(np.sin(x) + rng.normal(0, 0.5, n))
    for formula in ("y ~| OU(:x) * Matern32(:x) + Noise",
                    "y ~| Matern52(:x) * Linear(:x) + Noise"):
        spec = parse_formula(formula)
        ck = compile_formula(spec.formula)
        m_sde = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
        m_dense = build_model(ck, ["x"], X, y, spec.likelihood)
        for seed in range(3):
            u = jax.random.uniform(jax.random.key(seed), (m_sde.dim,),
                                   minval=-1.5, maxval=1.5)
            a, b = float(m_sde.logdensity(u)), float(m_dense.logdensity(u))
            assert abs(a - b) < 1e-7 * max(1.0, abs(b)), formula
            ga = np.asarray(jax.grad(m_sde.logdensity)(u))
            gb = np.asarray(jax.grad(m_dense.logdensity)(u))
            np.testing.assert_allclose(ga, gb, rtol=1e-6, atol=1e-8)


def test_grouped_product_sde_matches_dense():
    """Product × Cat grouping: (OU·Matern32)(t,t')·1[g==g'] — per-group
    independent Kronecker chains via the reset mechanism, the longitudinal
    quasi-kernel workflow at state-space cost (ref test/pred.jl:3-6)."""
    rng = np.random.default_rng(11)
    n = 90
    g = rng.integers(0, 3, n).astype(float)
    t = rng.uniform(0, 10, n)
    spec = parse_formula("y ~| OU(:t)*Matern32(:t)*Cat(:g) + Cat(:g) + Noise")
    ck = compile_formula(spec.formula)
    X = jnp.asarray(np.stack([t, t, g, g], 1))
    y = jnp.asarray(rng.normal(0, 1, n))
    m_sde = build_model(ck, ["t"], X, y, spec.likelihood, approx="sde")
    m_dense = build_model(ck, ["t"], X, y, spec.likelihood)
    for seed in range(3):
        u = jax.random.uniform(jax.random.key(seed), (m_sde.dim,),
                               minval=-1.5, maxval=1.5)
        a, b = float(m_sde.logdensity(u)), float(m_dense.logdensity(u))
        assert abs(a - b) < 1e-7 * max(1.0, abs(b))
        ga = np.asarray(jax.grad(m_sde.logdensity)(u))
        gb = np.asarray(jax.grad(m_dense.logdensity)(u))
        np.testing.assert_allclose(ga, gb, rtol=1e-6, atol=1e-8)


def test_quasiperiodic_sde_accuracy():
    """The QUASI-PERIODIC kernel Periodic(p)·Matern32 — THE longitudinal
    seasonality model — through the product SSM at controlled lengthscales:
    parity vs dense inherits only the Periodic factor's J=10 truncation
    envelope (tests/test_markov.py::test_periodic_sde_accuracy)."""
    rng = np.random.default_rng(5)
    n = 120
    x = np.sort(rng.uniform(0, 12, n))
    X = jnp.asarray(np.stack([x, x], 1))  # one design column per leaf
    y = jnp.asarray(np.sin(2 * np.pi * x / 3.0) * np.exp(-0.05 * x)
                    + rng.normal(0, 0.3, n))
    spec = parse_formula("y ~| Periodic(:x; p=3.0) * Matern32(:x) + Noise")
    ck = compile_formula(spec.formula)
    ms = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
    md = build_model(ck, ["x"], X, y, spec.likelihood)
    for l_per, l_m, tol in [(0.7, 2.0, 1e-3), (1.5, 5.0, 1e-6),
                            (1.0, 1.0, 1e-4)]:
        u = ms.position_from(jnp.asarray([l_per, l_m, 0.3]), None)
        a, b = float(ms.logdensity(u)), float(md.logdensity(u))
        assert abs(a - b) < tol * max(1.0, abs(b)), (l_per, l_m)


def test_product_ss_predict_matches_dense():
    """ss_predict through a product block: posterior mean/var at new points
    for (Matern32·Linear) + Constant must equal the dense GP posterior."""
    from gaplac_tpu.ops import markov_ss as ss

    rng = np.random.default_rng(2)
    n, m, R = 40, 10, 0.4
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.asarray(rng.standard_normal(n))
    tn = jnp.asarray(np.sort(rng.uniform(-1, 11, m)))
    kinds = [(ss.BLOCK_M32, ss.BLOCK_LINEAR), ss.BLOCK_CONST]
    params = [(0.9, 0.5), 0.7]
    kf = lambda a, b: _kfun(1, 0.9)(jnp.concatenate([a, b]))[:a.shape[0],
                                                            a.shape[0]:]
    lam = 3.0 ** 0.5 / 0.9
    d = lambda a, b: jnp.abs(a[:, None] - b[None, :])
    kxf = lambda a, b: ((1 + lam * d(a, b)) * jnp.exp(-lam * d(a, b))
                        * (a[:, None] * b[None, :] + 0.5) + 0.7)
    Kxx = kxf(t, t)
    sol = jnp.linalg.solve(Kxx + R * jnp.eye(n), jnp.eye(n))
    mu_d = kxf(tn, t) @ sol @ y
    var_d = (jnp.diag(kxf(tn, tn))
             - jnp.einsum("md,de,me->m", kxf(tn, t), sol, kxf(tn, t)))
    mu_s, var_s = ss.ss_predict(kinds, params, t, [(None, t), None], y, R,
                                tn, [(None, tn), None])
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d),
                               atol=1e-8)


def test_rq_sde_accuracy():
    """RQ block = Gamma-mixture of SqExp SSM blocks (exact mixture identity
    via the Gamma MGF; hybrid GGL / quantile+NNLS quadrature — see
    ops/markov_ss.py::rq_mixture_constants).  Marginal-lp parity vs dense
    within the measured envelope (n=200: |dlp| <= 0.26 nats over
    alpha in [0.5, 5], l in [0.3, 3]); gradients finite."""
    rng = np.random.default_rng(0)
    n = 200
    x = np.sort(rng.uniform(0, 10, n))
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(np.sin(x) + rng.normal(0, 0.5, n))
    for alpha in (0.5, 2.0):
        spec = parse_formula(f"y ~| RQ(:x; alpha={alpha}) + Noise")
        ck = compile_formula(spec.formula)
        ms = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
        md = build_model(ck, ["x"], X, y, spec.likelihood)
        for ell, tol in [(0.3, 0.15), (1.0, 0.1), (3.0, 0.3)]:
            u = ms.position_from(jnp.asarray([ell, 0.3]), None)
            a, b = float(ms.logdensity(u)), float(md.logdensity(u))
            assert abs(a - b) < tol, (alpha, ell, a - b)
            g = np.asarray(jax.grad(ms.logdensity)(u))
            assert np.isfinite(g).all()


def test_rq_sde_rejects_dynamic_alpha():
    """--infer-extra on an RQ variable under sde must raise at build (the
    quadrature nodes are static polynomial roots), not silently use the
    static alpha."""
    rng = np.random.default_rng(1)
    n = 30
    x = np.sort(rng.uniform(0, 10, n))
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(rng.normal(0, 1, n))
    spec = parse_formula("y ~| RQ(:x; alpha=2.0)")
    ck = compile_formula(spec.formula)
    with pytest.raises(ValueError, match="alpha cannot be inferred"):
        build_model(ck, ["x"], X, y, spec.likelihood, approx="sde",
                    infer_extras=["x"])
    # while Periodic's period stays dynamic-OK and RQ WITHOUT --infer-extra
    # builds fine
    m = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
    assert np.isfinite(float(m.logdensity(jnp.zeros(m.dim))))


def test_whitened_markov_matches_dense_whitened():
    """build_model(approx='sde', marginalize=False): the innovation-whitened
    latent model.  The innovation factorization of K + j·I is its UNIQUE
    lower-triangular factorization in step order, so on rows pre-sorted in
    the markov order the map f = L z — and hence the whole logdensity, for
    ANY likelihood — equals the dense ``build_latent_whitened`` pointwise
    (ref parity: the whitened non-Gaussian NUTS path of src/liklihoods.jl,
    here with no Cholesky and O(n log n) scans)."""
    rng = np.random.default_rng(0)
    n = 50
    x = np.sort(rng.uniform(0, 10, n))
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(np.sin(x) + rng.normal(0, 0.5, n))
    spec = parse_formula("y ~| OU(:x)")
    ck = compile_formula(spec.formula)
    mw = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde",
                     marginalize=False)
    md = build_model(ck, ["x"], X, y, spec.likelihood, marginalize=False)
    assert mw.dim == md.dim == n + 1
    for seed in range(3):
        v = jax.random.normal(jax.random.key(seed), (mw.dim,)) * 0.8
        a, b = float(mw.logdensity(v)), float(md.logdensity(v))
        assert abs(a - b) < 1e-9 * max(1.0, abs(b))
        ga = np.asarray(jax.grad(mw.logdensity)(v))
        gb = np.asarray(jax.grad(md.logdensity)(v))
        np.testing.assert_allclose(ga, gb, rtol=1e-8, atol=1e-10)

    # Bernoulli likelihood: same pointwise equality (general-likelihood path)
    z = (np.sin(x) > 0).astype(float)
    specb = parse_formula("z : Bernoulli ~| OU(:x)")
    ckb = compile_formula(specb.formula)
    mb = build_model(ckb, ["x"], X, jnp.asarray(z), specb.likelihood,
                     approx="sde", marginalize=False)
    mbd = build_model(ckb, ["x"], X, jnp.asarray(z), specb.likelihood,
                      marginalize=False)
    for seed in range(2):
        v = jax.random.normal(jax.random.key(seed), (mb.dim,)) * 0.5
        assert abs(float(mb.logdensity(v)) - float(mbd.logdensity(v))) < 1e-9

    # grouped formula, rows PRE-SORTED in the markov (group, time) order so
    # the dense chol order coincides with the innovation order
    g = rng.integers(0, 3, n).astype(float)
    t = rng.uniform(0, 10, n)
    order = np.lexsort((t, g))
    t, g = t[order], g[order]
    zz = (np.sin(t) > 0).astype(float)
    spec2 = parse_formula("z : Bernoulli ~| OU(:t)*Cat(:g) + Noise")
    ck2 = compile_formula(spec2.formula)
    X2 = jnp.asarray(np.stack([t, g], 1))
    m2 = build_model(ck2, ["t"], X2, jnp.asarray(zz), spec2.likelihood,
                     approx="sde", marginalize=False)
    m2d = build_model(ck2, ["t"], X2, jnp.asarray(zz), spec2.likelihood,
                      marginalize=False)
    v = jax.random.normal(jax.random.key(5), (m2.dim,)) * 0.5
    assert abs(float(m2.logdensity(v)) - float(m2d.logdensity(v))) < 1e-9


def test_whitened_markov_roundtrip_and_report():
    """position_from inverts report's latent draw (z = L⁻¹f via the inverse
    innovation recurrence), and the report lp equals the dense whitened
    report lp at the same position."""
    rng = np.random.default_rng(1)
    n = 40
    x = np.sort(rng.uniform(0, 10, n))
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(np.sin(x) + rng.normal(0, 0.5, n))
    spec = parse_formula("y ~| OU(:x) + Noise")
    ck = compile_formula(spec.formula)
    mw = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde",
                     marginalize=False)
    md = build_model(ck, ["x"], X, y, spec.likelihood, marginalize=False)
    v = jax.random.normal(jax.random.key(9), (mw.dim,)) * 0.5
    theta, f, lp = mw.report(jax.random.key(1), v)
    v2 = mw.position_from(theta, f)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-10)
    _, fd, lpd = md.report(jax.random.key(1), v)
    np.testing.assert_allclose(np.asarray(f), np.asarray(fd), atol=1e-9)
    assert abs(float(lp) - float(lpd)) < 1e-8


def test_cli_whitened_sde_mcmc(tmp_path):
    """--no-marginalize --approx sde through the CLI: the innovation
    -whitened joint model samples [θ, z] with the reference chain schema
    (ℓ, fx[i], lp) and finite lp — for a non-Gaussian likelihood too."""
    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(5)
    n = 30
    x = np.sort(rng.uniform(0, 10, n))
    y = np.sin(x) + rng.normal(0, 0.5, n)
    z = (y > 0).astype(float)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": y, "z": z}).to_csv(data, sep="\t", index=False)

    chain = tmp_path / "chain.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| OU(:x)", "--data", str(data),
        "--infer", "x", "--samples", "15", "--warmup", "30",
        "--no-marginalize", "--approx", "sde", "--seed", "2",
        "--output", str(chain),
    ])
    assert rc == 0
    cdf = pd.read_csv(chain, sep="\t")
    assert "ℓ" in cdf.columns and "lp" in cdf.columns and "fx[1]" in cdf.columns
    assert np.isfinite(cdf["lp"]).all()

    chain2 = tmp_path / "chain2.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "z : Bernoulli ~| OU(:x)", "--data",
        str(data), "--infer", "x", "--samples", "15", "--warmup", "30",
        "--no-marginalize", "--approx", "sde", "--seed", "3",
        "--output", str(chain2),
    ])
    assert rc == 0
    assert np.isfinite(pd.read_csv(chain2, sep="\t")["lp"]).all()


def test_ss_filter_cov_matches_full_filter():
    """ss_filter_cov (covariance-only combine, the whitened-sde hot path)
    must equal the full filter's P_f: with y ≡ 0 the mean recursion it
    drops is identically zero."""
    from gaplac_tpu.ops import markov_ss as ss

    rng = np.random.default_rng(11)
    n = 47
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    kinds = [ss.BLOCK_M32, ss.BLOCK_SQEXP]
    A, Q, H = ss.build_steps(kinds, [0.8, 1.7], t, [None, None])
    _, P_full = ss.ss_filter(A, Q, H, jnp.zeros((n,), t.dtype), 0.3)
    P_cov = ss.ss_filter_cov(A, Q, H, 0.3)
    np.testing.assert_allclose(np.asarray(P_cov), np.asarray(P_full),
                               rtol=1e-9, atol=1e-11)

    # masked-observation variant (every third point unobserved)
    obs = jnp.asarray(rng.uniform(size=n) > 0.3)
    _, P_full_m = ss.ss_filter(A, Q, H, jnp.zeros((n,), t.dtype), 0.3,
                               obs=obs)
    P_cov_m = ss.ss_filter_cov(A, Q, H, 0.3, obs=obs)
    np.testing.assert_allclose(np.asarray(P_cov_m), np.asarray(P_full_m),
                               rtol=1e-9, atol=1e-11)


def test_sde_harmonics_knob():
    """--sde-harmonics J (VERDICT r4): Periodic state dim becomes 2J+1 —
    J=5 turns the quasi-periodic product's d=42 into d=22 (inside the
    unrolled-solve fast path, ~7x fewer d^3 FLOPs) — and is accuracy-free
    for l >= 0.7 (measured J=10 table showed truncation only matters at
    small l).  The RQ node knob scales its mixture dim the same way."""
    from gaplac_tpu.inference.routing import sde_structure_info
    from gaplac_tpu.ops import markov_ss as mss

    rng = np.random.default_rng(61)
    n = 150
    x = np.sort(rng.uniform(0, 10, n))
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(np.sin(2 * np.pi * x / 3.0) + rng.normal(0, 0.3, n))
    spec = parse_formula("y ~| Periodic(:x; p=3.0)")
    ck = compile_formula(spec.formula)
    md = build_model(ck, ["x"], X, y, spec.likelihood)
    assert mss.block_dim(mss.BLOCK_PERIODIC) == 21  # default J=10
    try:
        mss.set_periodic_harmonics(5)
        assert mss.block_dim(mss.BLOCK_PERIODIC) == 11
        m5 = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde")
        for ell, tol in [(0.7, 2e-3), (1.0, 2e-4), (2.0, 1e-5)]:
            u = m5.position_from(jnp.asarray([ell]), None)
            a, b = float(m5.logdensity(u)), float(md.logdensity(u))
            assert abs(a - b) < tol * max(1.0, abs(b)), ell

        # quasi-periodic product: d = 11 * 2 = 22 <= 24 (fast-path)
        ck_qp = compile_formula(
            parse_formula("y ~| Periodic(:x; p=3.0) * Matern32(:x)").formula)
        Xqp = np.stack([x, x], 1)
        d, _, _ = sde_structure_info(ck_qp, Xqp)
        assert d == 22

        # J out of range rejected
        with pytest.raises(ValueError):
            mss.set_periodic_harmonics(0)
    finally:
        mss.set_periodic_harmonics(10)

    try:
        mss.set_rq_nodes(4)
        assert mss.block_dim(mss.BLOCK_RQ) == 24
        ck_rq = compile_formula(parse_formula("y ~| RQ(:x; alpha=2)").formula)
        m_rq = build_model(ck_rq, ["x"], X, y, spec.likelihood, approx="sde")
        md_rq = build_model(ck_rq, ["x"], X, y, spec.likelihood)
        u = m_rq.position_from(jnp.asarray([1.0]), None)
        # K=4 quadrature is coarser than the K=8 default but still close
        assert abs(float(m_rq.logdensity(u)) - float(md_rq.logdensity(u))) < 0.5
    finally:
        mss.set_rq_nodes(8)


def test_cli_sde_harmonics_flag(tmp_path):
    """--sde-harmonics threads from the CLI into the structure build (and
    is reset here to keep the test process clean)."""
    import pandas as pd

    from gaplac_tpu.cli.main import main
    from gaplac_tpu.ops import markov_ss as mss

    rng = np.random.default_rng(62)
    n = 40
    x = np.sort(rng.uniform(0, 10, n))
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": np.sin(2 * np.pi * x / 3.0)
                  + rng.normal(0, 0.3, n)}).to_csv(data, sep="\t", index=False)
    out = tmp_path / "c.tsv"
    try:
        rc = main(["--platform", "cpu", "mcmc", "y ~| Periodic(:x; p=3.0)",
                   "--data", str(data), "--infer", "x", "--approx", "sde",
                   "--sde-harmonics", "5", "--samples", "6", "--warmup", "10",
                   "--seed", "0", "--output", str(out)])
        assert rc == 0
        assert mss.PERIODIC_J == 5  # knob took effect
        assert np.isfinite(pd.read_csv(out, sep="\t")["lp"]).all()
    finally:
        mss.set_periodic_harmonics(10)


def test_windowed_smoothing_matches_monolithic():
    """ss_smooth_windowed / ss_predict(window=...): interior estimates match
    the monolithic smoother once the overlap spans a few lengthscales —
    the compile-bounded high-d predict mode (VERDICT r4 task 9)."""
    from gaplac_tpu.ops import markov_ss as ss

    rng = np.random.default_rng(77)
    n, m = 512, 64
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.asarray(np.sin(2 * np.pi * t / 3.0) + 0.3 * rng.standard_normal(n))
    tn = jnp.asarray(np.sort(rng.uniform(0.5, 9.5, m)))
    # short lengthscales so 96 overlap rows span >> 5 lengthscales
    kinds = [ss.BLOCK_M32, (ss.BLOCK_PERIODIC, ss.BLOCK_OU)]
    params = [0.25, ((0.8, 3.0), 0.4)]
    xs = [None, (None, None)]
    xs_new = [None, (None, None)]
    mu_m, var_m = ss.ss_predict(kinds, params, t, xs, y, 0.3, tn, xs_new)
    mu_w, var_w = ss.ss_predict(kinds, params, t, xs, y, 0.3, tn, xs_new,
                                window=128, overlap=96)
    # residual error is the truncated remote influence: 96 overlap rows x
    # ~0.02 spacing ~ 4.7 OU lengthscales -> ~1e-5 absolute (measured)
    np.testing.assert_allclose(np.asarray(mu_w), np.asarray(mu_m),
                               rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(var_w), np.asarray(var_m),
                               rtol=1e-4, atol=3e-5)
    # tiny overlap must NOT match (sanity that the tolerance bites)
    mu_t, _ = ss.ss_predict(kinds, params, t, xs, y, 0.3, tn, xs_new,
                            window=128, overlap=1)
    assert np.abs(np.asarray(mu_t) - np.asarray(mu_m)).max() > 1e-3


def test_cli_predict_sde_window(tmp_path):
    """predict --approx sde --sde-window: same output schema, near-identical
    values to the monolithic run."""
    import pandas as pd

    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(78)
    n = 300
    x = np.sort(rng.uniform(0, 10, n))
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": np.sin(2 * np.pi * x / 3.0)
                  + rng.normal(0, 0.3, n)}).to_csv(data, sep="\t", index=False)
    outs = []
    for name, extra in [("mono", []), ("win", ["--sde-window", "100",
                                               "--sde-overlap", "60"])]:
        out = tmp_path / f"p_{name}.tsv"
        rc = main(["--platform", "cpu", "predict", "y ~| Matern32(:x; l=0.5)",
                   "--data", str(data), "--at", "x=0.5:0.25:9.5",
                   "--approx", "sde", "--output", str(out)] + extra)
        assert rc == 0
        outs.append(pd.read_csv(out, sep="\t"))
    np.testing.assert_allclose(outs[1]["ymu"], outs[0]["ymu"],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(outs[1]["yQ050"], outs[0]["yQ050"],
                               rtol=1e-3, atol=5e-3)


def test_soa_tiny_d_matches_dense_layout():
    """The struct-of-arrays tiny-d path (d <= SOA_MAX_D: elements carried as
    pytrees of (n,) arrays — zero TPU tile padding) must reproduce the dense
    (n, d, d) layout path exactly: loglik + its lengthscale gradient, the
    masked filter/covariance filter, the smoother, and the innovation
    coefficients, across Matern32 (d=2), Matern52 (d=3), additive OU +
    Matern32 (d=3) and Linear (d=2)."""
    from gaplac_tpu.ops import markov_ss as ss

    rng = np.random.default_rng(3)
    n = 120
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.asarray(np.sin(np.asarray(t)) + rng.normal(0, 0.3, n))
    obs = jnp.asarray(rng.uniform(size=n) > 0.2)
    cases = [
        ((ss.BLOCK_M32,), (0.8,)),
        ((ss.BLOCK_M52,), (1.3,)),
        ((ss.BLOCK_OU, ss.BLOCK_M32), (0.5, 1.1)),
        ((ss.BLOCK_LINEAR,), (0.7,)),
    ]
    saved = (ss.SOA_MAX_D, ss.SOA_ON_CPU)
    ss.SOA_ON_CPU = True  # the SoA layout is TPU-routed by default
    try:
        for kinds, params in cases:
            xs = [t if k == ss.BLOCK_LINEAR else None for k in kinds]
            A, Q, H = ss.build_steps(kinds, params, t, xs)
            assert A.shape[-1] <= 4

            def lp_of_l(l):
                A_, Q_, H_ = ss.build_steps(
                    kinds, (l,) + tuple(params[1:]), t, xs)
                return ss.ss_loglik(A_, Q_, H_, y, 0.3)

            outs = {}
            for tag, maxd in [("soa", 4), ("dense", 0)]:
                ss.SOA_MAX_D = maxd
                outs[tag] = (
                    ss.ss_loglik(A, Q, H, y, 0.3),
                    jax.grad(lp_of_l)(params[0]),
                    *ss.ss_filter(A, Q, H, y, 0.3, obs=obs),
                    ss.ss_filter_cov(A, Q, H, 0.3, obs=obs),
                    *ss.ss_smooth(A, Q, H, y, 0.3, obs=obs),
                    *ss.ss_innovation_coeffs(A, Q, H, 1e-6),
                )
            for a, b in zip(outs["soa"], outs["dense"]):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-9, atol=1e-10)
    finally:
        ss.SOA_MAX_D, ss.SOA_ON_CPU = saved


def test_build_steps_soa_native_parity():
    """``build_steps(layout='auto')`` emits the per-step model natively as
    SoA leaves — no (n, d, d) array anywhere in the trace (the round-5 fix
    for XLA's remat-with-compression pass materializing 64x-tile-padded
    copies of the dense construction buffers; benchmarks/results_v5e.txt).
    It must match the dense build exactly: the returned model (via
    densify_steps), loglik + gradient (incl. under vmap, the SMC shape),
    the smoother, resets, and the SoA-input guards on the dense-math
    consumers (prior sample, innovation coefficients, whitening)."""
    from gaplac_tpu.ops import markov_ss as ss

    rng = np.random.default_rng(11)
    n = 150
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.asarray(np.sin(np.asarray(t)) + rng.normal(0, 0.3, n))
    rs = np.zeros(n, bool)
    rs[50] = rs[100] = True
    cases = [
        ((ss.BLOCK_M32,), (0.8,), None),
        ((ss.BLOCK_M52,), (1.3,), None),
        ((ss.BLOCK_OU, ss.BLOCK_M32), (0.5, 1.1), None),
        ((ss.BLOCK_LINEAR, ss.BLOCK_CONST), (0.7, 0.9), None),
        ((ss.BLOCK_M32,), (0.8,), (jnp.asarray(rs),)),
    ]
    saved = (ss.SOA_MAX_D, ss.SOA_ON_CPU)
    ss.SOA_ON_CPU = True  # SoA is accelerator-routed by default
    try:
        for kinds, params, resets in cases:
            xs = [t if k == ss.BLOCK_LINEAR else None for k in kinds]
            Ad, Qd, Hd = ss.build_steps(kinds, params, t, xs, resets=resets)
            As, Qs, Hs = ss.build_steps(kinds, params, t, xs, resets=resets,
                                        layout="auto")
            assert ss.steps_are_soa(As) and not ss.steps_are_soa(Ad)
            for a, b in zip((Ad, Qd, Hd), ss.densify_steps(As, Qs, Hs)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0, atol=1e-12)

            def lp(l, layout):
                A_, Q_, H_ = ss.build_steps(
                    kinds, (l,) + tuple(params[1:]), t, xs, resets=resets,
                    layout=layout)
                return ss.ss_loglik(A_, Q_, H_, y, 0.1)

            np.testing.assert_allclose(float(lp(params[0], "dense")),
                                       float(lp(params[0], "auto")),
                                       rtol=1e-11)
            gd = float(jax.grad(lambda l: lp(l, "dense"))(params[0]))
            gs = float(jax.grad(lambda l: lp(l, "auto"))(params[0]))
            np.testing.assert_allclose(gd, gs, rtol=1e-6)
            # vmap over the hyperparameter — the SMC/chain-batch shape
            ls = jnp.asarray([0.5, 0.9, 1.7])
            np.testing.assert_allclose(
                np.asarray(jax.vmap(lambda l: lp(l, "dense"))(ls)),
                np.asarray(jax.vmap(lambda l: lp(l, "auto"))(ls)),
                rtol=1e-11)
            # smoother parity on SoA-native input
            md, Pd = ss.ss_smooth(Ad, Qd, Hd, y, 0.1)
            m2, P2 = ss.ss_smooth(As, Qs, Hs, y, 0.1)
            np.testing.assert_allclose(np.asarray(md), np.asarray(m2),
                                       rtol=1e-9, atol=1e-10)
            np.testing.assert_allclose(np.asarray(Pd), np.asarray(P2),
                                       rtol=1e-9, atol=1e-10)
            # dense-math consumers accept SoA input via the densify guards
            np.testing.assert_allclose(
                np.asarray(ss.ss_prior_sample(jax.random.key(0), As, Qs)),
                np.asarray(ss.ss_prior_sample(jax.random.key(0), Ad, Qd)),
                rtol=1e-9, atol=1e-12)
            Kg, S = ss.ss_innovation_coeffs(As, Qs, Hs, 1e-4)
            Kg2, S2 = ss.ss_innovation_coeffs(Ad, Qd, Hd, 1e-4)
            np.testing.assert_allclose(np.asarray(S), np.asarray(S2),
                                       rtol=1e-9)
            z = jnp.asarray(rng.standard_normal(n))
            np.testing.assert_allclose(
                np.asarray(ss.ss_whiten_apply(As, Hs, Kg, S, z)),
                np.asarray(ss.ss_whiten_apply(Ad, Hd, Kg2, S2, z)),
                rtol=1e-9, atol=1e-10)
    finally:
        ss.SOA_MAX_D, ss.SOA_ON_CPU = saved


def test_build_steps_soa_native_extended_blocks():
    """SoA-native emitters for the approximate/large blocks — SqExp (d=6),
    Periodic (J=2 → d=5), RQ (K=1 → d=6), and Kronecker product kinds —
    match the dense build exactly: model arrays (via densify_steps), loglik
    and its gradient.  With every block kind symbolically expressible
    (SqExp/Periodic transitions are damped/pure rotations over static modal
    constants), the total-state-dim gate (SOA_MAX_D), not emitter coverage,
    is the only SoA routing criterion."""
    from gaplac_tpu.ops import markov_ss as ss

    rng = np.random.default_rng(7)
    n = 120
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.asarray(np.sin(np.asarray(t)) + rng.normal(0, 0.3, n))
    saved = (ss.SOA_MAX_D, ss.SOA_ON_CPU, ss.PERIODIC_J, ss.RQ_MIX_K)
    ss.SOA_ON_CPU = True  # SoA is accelerator-routed by default
    ss.SOA_MAX_D = 8
    try:
        ss.set_periodic_harmonics(2)   # d = 2J+1 = 5
        ss.set_rq_nodes(1)             # d = SQEXP_ORDER = 6
        cw = ss.rq_mixture_constants(1.5, 1)
        cases = [
            ((ss.BLOCK_SQEXP,), (0.9,), [None]),
            ((ss.BLOCK_PERIODIC,), ((0.8, 3.0),), [None]),
            ((ss.BLOCK_RQ,), ((0.9,) + tuple(cw),), [None]),
            (((ss.BLOCK_OU, ss.BLOCK_M32),), ((0.5, 1.1),), [(None, None)]),
            ((ss.BLOCK_OU, ss.BLOCK_CONST), (0.5, 0.9), [None, None]),
        ]
        for kinds, params, xs in cases:
            Ad, Qd, Hd = ss.build_steps(kinds, params, t, xs)
            As, Qs, Hs = ss.build_steps(kinds, params, t, xs, layout="auto")
            assert ss.steps_are_soa(As) and not ss.steps_are_soa(Ad)
            for a, b in zip((Ad, Qd, Hd), ss.densify_steps(As, Qs, Hs)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0, atol=1e-11)
            np.testing.assert_allclose(
                float(ss.ss_loglik(Ad, Qd, Hd, y, 0.1)),
                float(ss.ss_loglik(As, Qs, Hs, y, 0.1)), rtol=1e-11)

        # gradient parity through the emitters with a dynamic lengthscale
        def lp(l, layout, kinds, mk, xs):
            A_, Q_, H_ = ss.build_steps(kinds, mk(l), t, xs, layout=layout)
            return ss.ss_loglik(A_, Q_, H_, y, 0.1)

        grad_cases = [
            ((ss.BLOCK_SQEXP,), lambda l: (l,), [None]),
            ((ss.BLOCK_PERIODIC,), lambda l: ((l, 3.0),), [None]),
            ((ss.BLOCK_RQ,), lambda l: ((l,) + tuple(cw),), [None]),
            (((ss.BLOCK_OU, ss.BLOCK_M32),), lambda l: ((l, 1.1),),
             [(None, None)]),
        ]
        for kinds, mk, xs in grad_cases:
            gd = float(jax.grad(lambda l: lp(l, "dense", kinds, mk, xs))(0.9))
            gs = float(jax.grad(lambda l: lp(l, "auto", kinds, mk, xs))(0.9))
            np.testing.assert_allclose(gd, gs, rtol=1e-6)
    finally:
        (ss.SOA_MAX_D, ss.SOA_ON_CPU, ss.PERIODIC_J, ss.RQ_MIX_K) = saved


def test_dtf_mid_d_matches_dense_layout():
    """The dims-to-front (DTF) mid-d path (SOA_MAX_D < d <= DTF_MAX_D:
    elements carried as (d, d, n) / (d, 1, n) arrays with n in the minor
    lane dim — the TPU tile-padding fix for state dims the SoA unroll
    cannot reach without O(d^3) trace cost) must reproduce the dense
    (n, d, d) layout exactly: loglik parts, loglik + its lengthscale
    gradient (incl. under vmap, the SMC/chain-batch shape), across SqExp
    (d=6), Periodic J=3 (d=7), the quasi-periodic Kronecker product
    Periodic*Matern32 J=2 (d=10) and an additive OU+M52+SqExp (d=10)."""
    from gaplac_tpu.ops import markov_ss as ss

    rng = np.random.default_rng(5)
    n = 120
    t = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.asarray(np.sin(np.asarray(t)) + rng.normal(0, 0.3, n))
    saved = (ss.SOA_MAX_D, ss.DTF_ON_CPU, ss.DTF_MAX_D, ss.PERIODIC_J)
    ss.DTF_ON_CPU = True  # DTF is accelerator-routed by default
    try:
        ss.set_periodic_harmonics(3)   # d = 2J+1 = 7
        cases = [
            ((ss.BLOCK_SQEXP,), (0.9,), [None], 6),
            ((ss.BLOCK_PERIODIC,), ((0.8, 3.0),), [None], 7),
            ((ss.BLOCK_OU, ss.BLOCK_M52, ss.BLOCK_SQEXP), (0.5, 1.1, 0.9),
             [None, None, None], 10),
        ]
        for kinds, params, xs, d_expect in cases:
            assert sum(ss.block_dim(k) for k in kinds) == d_expect
            assert ss._dtf_active(d_expect)

            def lp(l, dtf_max):
                ss.DTF_MAX_D = dtf_max
                A_, Q_, H_ = ss.build_steps(
                    kinds, (l,) + tuple(params[1:]), t, xs, layout="auto")
                # DTF on -> SoA-native emit; off -> dense build
                assert ss.steps_are_soa(A_) == (dtf_max > 0)
                return ss.ss_loglik(A_, Q_, H_, y, 0.1)

            l0 = params[0]
            np.testing.assert_allclose(float(lp(l0, 0)), float(lp(l0, 24)),
                                       rtol=1e-9)
            if not isinstance(l0, tuple):
                gd = float(jax.grad(lambda l: lp(l, 0))(l0))
                gs = float(jax.grad(lambda l: lp(l, 24))(l0))
                np.testing.assert_allclose(gd, gs, rtol=1e-6)
                ls = jnp.asarray([0.5, 0.9, 1.7])
                np.testing.assert_allclose(
                    np.asarray(jax.vmap(lambda l: lp(l, 0))(ls)),
                    np.asarray(jax.vmap(lambda l: lp(l, 24))(ls)),
                    rtol=1e-9)

        # quasi-periodic Kronecker product (the flagship mid-d model):
        # Periodic(J=2)*Matern32 -> d = 5*2 = 10
        ss.set_periodic_harmonics(2)
        kinds = ((ss.BLOCK_PERIODIC, ss.BLOCK_M32),)
        xs = [(None, None)]

        def lp_qp(l, dtf_max):
            ss.DTF_MAX_D = dtf_max
            A_, Q_, H_ = ss.build_steps(
                kinds, (((0.8, 3.0), l),), t, xs, layout="auto")
            return ss.ss_loglik(A_, Q_, H_, y, 0.1)

        np.testing.assert_allclose(float(lp_qp(1.1, 0)), float(lp_qp(1.1, 24)),
                                   rtol=1e-9)
        np.testing.assert_allclose(
            float(jax.grad(lambda l: lp_qp(l, 0))(1.1)),
            float(jax.grad(lambda l: lp_qp(l, 24))(1.1)), rtol=1e-6)

        # ss_loglik_parts (the Laplace-marginal consumer) parity at d=6
        ss.DTF_MAX_D = 24
        A6, Q6, H6 = ss.build_steps((ss.BLOCK_SQEXP,), (0.9,), t, [None],
                                    layout="auto")
        qs, lds = ss.ss_loglik_parts(A6, Q6, H6, y, 0.1)
        ss.DTF_MAX_D = 0
        A6d, Q6d, H6d = ss.build_steps((ss.BLOCK_SQEXP,), (0.9,), t, [None],
                                       layout="auto")
        qd, ldd = ss.ss_loglik_parts(A6d, Q6d, H6d, y, 0.1)
        np.testing.assert_allclose(float(qs), float(qd), rtol=1e-9)
        np.testing.assert_allclose(float(lds), float(ldd), rtol=1e-9)
    finally:
        ss.SOA_MAX_D, ss.DTF_ON_CPU, ss.DTF_MAX_D = saved[:3]
        ss.set_periodic_harmonics(saved[3])
