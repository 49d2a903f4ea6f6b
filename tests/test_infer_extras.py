"""Inferable kernel shape parameters (--infer-extra): Periodic's period and
RQ's alpha as trailing slots of the extended parameter vector.

The reference's DSL fixes these in the formula (KernelFunctions constructor
arguments, abstractgp_translations.jl:8-15); inferring them is a capability
extension, validated here by (a) closed-form gram equality through the
extended params path, (b) bind()/gram() equivalence with dynamic extra
slots including gradients, and (c) the same quadrature posterior oracle as
test_posterior_exact.py on an RQ-alpha model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from scipy.special import logsumexp

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.inference.model import build_model, slot_groups_for
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import mvn


def _ck(formula: str):
    return compile_formula(parse_formula(formula).formula)


def test_extended_param_vector_layout():
    ck = _ck("y ~| Periodic(:x; l=1.2, p=3.0) + RQ(:t; l=2.0, alpha=1.5) + SqExp(:s)")
    assert ck.n_leaves == 3
    assert ck.n_params == 5
    assert ck.extra_slots == ((3,), (4,), ())
    p = np.asarray(ck.default_params())
    np.testing.assert_allclose(p, [1.2, 2.0, 1.0, 3.0, 1.5])
    # shape-param slot lookup by variable
    assert ck.extra_slots_for_vars(["x"]) == (3,)
    assert ck.extra_slots_for_vars(["t"]) == (4,)
    assert ck.extra_slots_for_vars(["x", "t"]) == (3, 4)
    with pytest.raises(ValueError, match="shape"):
        ck.extra_slots_for_vars(["s"])  # SqExp has no shape parameter


def test_gram_reads_extras_from_extended_params():
    ck = _ck("y ~| Periodic(:x; l=1.2, p=3.0)")
    x = jnp.asarray(np.random.default_rng(0).uniform(-4, 4, 12))
    X = x[:, None]
    for period in (3.0, 0.7, 5.5):
        params = ck.default_params().at[1].set(period)
        K = np.asarray(ck.gram(params, X))
        d = np.asarray(x)[:, None] - np.asarray(x)[None, :]
        expect = np.exp(-2.0 * np.sin(np.pi * d / period) ** 2 / 1.2**2)
        np.testing.assert_allclose(K, expect, rtol=1e-12)
    # legacy (n_leaves,) params keep the static formula value
    K_legacy = np.asarray(ck.gram(jnp.asarray([1.2]), X))
    d = np.asarray(x)[:, None] - np.asarray(x)[None, :]
    np.testing.assert_allclose(
        K_legacy, np.exp(-2.0 * np.sin(np.pi * d / 3.0) ** 2 / 1.2**2), rtol=1e-12
    )


def test_rq_alpha_from_extended_params():
    ck = _ck("y ~| RQ(:x; l=2.0, alpha=1.5)")
    x = jnp.asarray(np.random.default_rng(1).uniform(-4, 4, 10))
    X = x[:, None]
    for alpha in (1.5, 0.3, 6.0):
        params = ck.default_params().at[1].set(alpha)
        K = np.asarray(ck.gram(params, X))
        d2 = (np.asarray(x)[:, None] - np.asarray(x)[None, :]) ** 2
        expect = (1.0 + d2 / (2.0 * alpha * 4.0)) ** (-alpha)
        np.testing.assert_allclose(K, expect, rtol=1e-12)


def test_bind_matches_gram_with_dynamic_extras():
    """bind() with extra slots dynamic must equal gram() in value AND grad
    (the sampler hot path runs through gram_bound)."""
    ck = _ck("y ~| Periodic(:x; l=1.0, p=2.0) * Cat(:g) + RQ(:t; l=1.0, alpha=1.0) + Noise(:x)")
    rng = np.random.default_rng(3)
    n = 14
    X = jnp.asarray(
        np.column_stack([rng.uniform(-3, 3, n), rng.integers(0, 2, n),
                         rng.uniform(0, 5, n), rng.uniform(-3, 3, n)])
    )
    # dynamic: Periodic l (0) + period (4), RQ alpha only (5), Noise s2 (3)
    dyn = (0, 3, 4, 5)
    gram_bound = ck.bind(X, dyn, diag=0.3)

    def via_bind(vals):
        p = ck.default_params(X.dtype).at[jnp.asarray(dyn)].set(vals)
        return gram_bound(p)

    def via_gram(vals):
        p = ck.default_params(X.dtype).at[jnp.asarray(dyn)].set(vals)
        return ck.gram(p, X) + 0.3 * jnp.eye(n, dtype=X.dtype)

    vals = jnp.asarray([1.7, 0.4, 3.3, 0.8], X.dtype)
    np.testing.assert_allclose(np.asarray(via_bind(vals)), np.asarray(via_gram(vals)),
                               rtol=1e-10, atol=1e-12)
    g1 = jax.grad(lambda v: jnp.sum(jnp.sin(via_bind(v))))(vals)
    g2 = jax.grad(lambda v: jnp.sum(jnp.sin(via_gram(v))))(vals)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9, atol=1e-12)


def test_slot_groups_with_extras():
    ck = _ck("y ~| Periodic(:x; l=1, p=2) + RQ(:t; l=1, alpha=1)")
    # lengthscales shared + both shape params, each its own group
    groups = slot_groups_for(ck, ["x", "t"], shared=True, infer_extras=["x", "t"])
    assert groups == ((0, 1), (2,), (3,))
    # extras only (no --infer)
    assert slot_groups_for(ck, [], infer_extras=["t"]) == ((3,),)
    with pytest.raises(ValueError, match="nothing to infer"):
        slot_groups_for(ck, [], infer_extras=[])


@pytest.fixture(scope="module")
def rq_alpha_setup():
    """Data from RQ(l=2, alpha=0.5); quadrature posterior over alpha with l
    fixed — the --infer-extra statistical oracle."""
    rng = np.random.default_rng(21)
    x = rng.uniform(-8, 8, 50)
    gen = _ck("y ~| RQ(:x; l=2.0, alpha=0.5)")
    X = jnp.asarray(x[:, None])
    y = mvn.sample_mvn(jax.random.key(2), gen.gram(gen.default_params(), X), jitter=0.1)
    ck = _ck("y ~| RQ(:x; l=2.0)")
    alphas = np.linspace(0.01, 19.99, 500)
    slot = ck.extra_slots_for_vars(["x"])[0]
    lps = np.array([
        float(mvn.mvn_logpdf(
            ck.gram(ck.default_params().at[slot].set(a), X) + 1.1 * jnp.eye(50), y
        ))
        for a in alphas
    ])
    post = np.exp(lps - logsumexp(lps))
    post /= post.sum()
    return X, y, alphas, np.cumsum(post)


def test_nuts_infer_extra_matches_quadrature(rq_alpha_setup):
    from gaplac_tpu.inference.nuts import run_nuts

    X, y, alphas, cdf = rq_alpha_setup
    spec = parse_formula("y ~| RQ(:x; l=2.0)")
    m = build_model(compile_formula(spec.formula), [], X, y, spec.likelihood,
                    infer_extras=["x"])
    assert m.dim == 1
    res = jax.jit(
        lambda k: run_nuts(k, m.logdensity, m.initial_position(jax.random.key(3)),
                           1500, num_warmup=500)
    )(jax.random.key(8))
    a_samp = np.sort(np.asarray(jax.vmap(m.constrain)(res.positions)).ravel())
    emp = np.arange(1, len(a_samp) + 1) / len(a_samp)
    theo = np.interp(a_samp, alphas, cdf)
    assert np.max(np.abs(emp - theo)) < 0.12


def test_cli_infer_extra_roundtrip(tmp_path):
    """mcmc --infer x --infer-extra x on a Periodic model -> chain with two
    hyperparameter columns; predict and sample consume it with the same
    flags (positional ℓ, ℓ_2 schema)."""
    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(5)
    n = 30
    x = np.sort(rng.uniform(0, 12, n))
    f = np.sin(2 * np.pi * x / 3.0)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": f + rng.normal(0, 0.3, n)}).to_csv(
        data, sep="\t", index=False
    )
    chain = tmp_path / "chain.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| Periodic(:x; l=1, p=3)",
        "--data", str(data), "--infer", "x", "--infer-extra", "x",
        "--samples", "40", "--warmup", "100", "--seed", "3",
        "--output", str(chain),
    ])
    assert rc == 0
    df = pd.read_csv(chain, sep="\t")
    assert "ℓ" in df.columns and "ℓ_2" in df.columns and "lp" in df.columns
    assert df["ℓ_2"].between(0, 20).all()  # the period, Uniform(0,20) prior

    out = tmp_path / "pred.tsv"
    rc = main([
        "--platform", "cpu", "predict", "y ~| Periodic(:x; l=1, p=3)",
        "--data", str(data), "--mcmc", str(chain),
        "--infer", "x", "--infer-extra", "x",
        "--at", "x=0:1:6", "--output", str(out), "--seed", "0",
    ])
    assert rc == 0
    pdf = pd.read_csv(out, sep="\t")
    assert {"ymu", "yQ050", "yQ950"} <= set(pdf.columns)

    samp = tmp_path / "post.tsv"
    rc = main([
        "--platform", "cpu", "sample", "y ~| Periodic(:x; l=1, p=3)",
        "--data", str(data), "--mcmc", str(chain),
        "--infer", "x", "--infer-extra", "x",
        "--at", "x=0:1:6", "--output", str(samp), "--seed", "0",
    ])
    assert rc == 0


def test_select_smc_infer_extra(tmp_path):
    """select --estimator smc integrates over a Periodic period via
    --infer-extra; the flag is skipped for the competing formula that has
    no shape parameter on that variable (OU)."""
    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(11)
    n = 40
    x = np.sort(rng.uniform(0, 12, n))
    y = np.sin(2 * np.pi * x / 3.0) + rng.normal(0, 0.3, n)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": y}).to_csv(data, sep="\t", index=False)
    rc = main([
        "--platform", "cpu", "select",
        "--formulae", "y ~| Periodic(:x; l=1, p=2)", "y ~| OU(:x)",
        "--data", str(data), "--estimator", "smc", "--particles", "256",
        "--infer", "x", "--infer-extra", "x", "--seed", "0",
    ])
    assert rc == 0


def test_infer_extra_rff_rejected():
    ck_spec = parse_formula("y ~| Periodic(:x; l=1, p=3)")
    X = jnp.asarray(np.linspace(0, 1, 8)[:, None])
    y = jnp.zeros(8)
    with pytest.raises(ValueError, match="infer-extra"):
        build_model(compile_formula(ck_spec.formula), ["x"], X, y,
                    ck_spec.likelihood, approx="rff", infer_extras=["x"])
