"""The reference's REAL data fixtures, end-to-end (VERDICT r1 missing item 1).

Runs the framework against /root/reference/test/testin/ unmodified:
  - input_pair_109.tsv — 921 microbiome rows (SampleID/bug/nutrient/
    StoolPairs/PersonID/Date), the composite-model workflow of
    /root/reference/test/pred.jl:3-6;
  - mcmc_{109,3206}.tsv — legacy chains (comma-delimited despite .tsv,
    θc[σ2..σ2_4] + lπ columns; SURVEY.md §2.3.2) whose joint log-posterior
    scale lπ ≈ −732 is the BASELINE.md row-4 correctness gate.

The strongest check here is draw-by-draw parity: evaluating OUR marginal MVN
density log N(y; 0, Σ σ2_i K_i) at the LEGACY chain's own (σ2_1..σ2_4) draws
must reproduce their lπ column up to their (θ-dependent) prior term — a
near-constant offset ~+10 nats with sub-2-nat spread.  That validates the
Cat/Cat*Cat/Linear/Noise kernel numerics on real 921-point data against
numbers produced by the original Julia stack years ago.
"""

import os

import numpy as np
import pandas as pd
import pytest

TESTIN = "/root/reference/test/testin"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTIN), reason="reference fixtures not mounted"
)

COMPOSITE = (
    "bug :~| Cat(PersonID) * Cat(StoolPairs) + Cat(PersonID) "
    "+ Linear(nutrient) + Noise"
)
DATA_109 = os.path.join(TESTIN, "input_pair_109.tsv")
CHAIN_109 = os.path.join(TESTIN, "mcmc_109.tsv")
CHAIN_3206 = os.path.join(TESTIN, "mcmc_3206.tsv")


@pytest.fixture(scope="module")
def component_grams():
    """The four component gram matrices of the legacy composite model on the
    real 921-row table, built by OUR compiler."""
    import jax.numpy as jnp

    from gaplac_tpu.cli.common import design_matrix
    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.kernels.covariance import compile_formula

    data = pd.read_csv(DATA_109, sep="\t")
    y = data["bug"].to_numpy()

    def gram_of(formula):
        ck = compile_formula(parse_formula(formula).formula)
        X = jnp.asarray(design_matrix(data, ck))
        return np.asarray(ck.gram(ck.default_params(), X))

    Ks = [
        gram_of("bug :~| Cat(PersonID) * Cat(StoolPairs)"),
        gram_of("bug :~| Cat(PersonID)"),
        gram_of("bug :~| Linear(nutrient)"),
        np.eye(len(y)),  # Noise
    ]
    return Ks, y


def test_legacy_chain_lp_scale_parity(component_grams):
    """BASELINE.md row 4: lπ ≈ −732.  Our marginal density at the legacy
    chain's own σ2 draws (column order σ2→Cat*Cat, σ2_2→Cat, σ2_3→Linear,
    σ2_4→Noise — the formula's term order, pred.jl:3) must land on that scale
    and track lπ draw-by-draw up to the legacy prior term."""
    Ks, y = component_grams
    n = len(y)
    chain = pd.read_csv(CHAIN_109)  # comma-delimited despite .tsv
    draws = chain[["θc[σ2]", "θc[σ2_2]", "θc[σ2_3]", "θc[σ2_4]"]].to_numpy()
    lpi = chain["lπ"].to_numpy()
    assert len(lpi) == 100 and np.all(lpi < -650) and np.all(lpi > -800)

    from numpy.linalg import slogdet, solve

    idx = np.arange(0, 100, 4)  # every 4th draw keeps this under ~10 s
    ours = []
    for t in draws[idx]:
        K = sum(t[j] * Ks[j] for j in range(4))
        ours.append(
            -0.5 * (slogdet(K)[1] + y @ solve(K, y) + n * np.log(2 * np.pi))
        )
    ours = np.array(ours)

    # the −732 scale, as our marginal (their joint minus their prior term)
    assert np.all(ours > -745) and np.all(ours < -715), ours

    # draw-by-draw: offset = legacy prior log-density, ~+10 nats, tight spread
    resid = ours - lpi[idx]
    assert 5.0 < resid.mean() < 15.0, resid.mean()
    assert resid.std() < 2.0, resid.std()


@pytest.fixture(scope="module")
def our_chain(tmp_path_factory):
    """mcmc on the real 921-row table with the composite formula (pred.jl:3
    flags scaled down: 20 draws is enough to exercise the full pipeline)."""
    from gaplac_tpu.cli.main import main

    out = tmp_path_factory.mktemp("ref109") / "chain.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", COMPOSITE, "--data", DATA_109,
        "--infer", "nutrient", "--samples", "20", "--warmup", "40",
        "--burnin", "4", "--thin", "2", "--no-latents", "--seed", "0",
        "--output", str(out),
    ])
    assert rc == 0
    return str(out)


def test_mcmc_on_real_fixture(our_chain):
    df = pd.read_csv(our_chain, sep="\t")
    assert len(df) == 8  # (20 - 4 burnin) / thin 2
    assert np.isfinite(df["lp"]).all()
    # our lp is the reference-LIVE-schema JOINT over 921 latents (prior +
    # N(f;0,K) + N(y;f,1)): much lower than the legacy marginal-scale lπ
    assert df["lp"].between(-4000, -1500).all()
    assert df["ℓ"].between(0, 20).all()


def test_select_consumes_legacy_chains_unmodified(capsys):
    from gaplac_tpu.cli.main import main

    rc = main(["--platform", "cpu", "select", "--chains", CHAIN_109, CHAIN_3206])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Log2 Bayes" in out
    bayes = float(out.split("**Log2 Bayes**:")[1].splitlines()[0])
    # harmonic-mean lπ of 109 (≈−733) vs 3206 (≈−938): decisively favors 109
    assert 150 < bayes < 300


def test_predict_on_real_fixture(our_chain, tmp_path):
    """pred.jl:6's predict call (coarser grid): posterior at nutrient grid
    with PersonID/StoolPairs pinned to a held-out category code 0."""
    from gaplac_tpu.cli.main import main

    out = tmp_path / "pred.tsv"
    rc = main([
        "--platform", "cpu", "predict", COMPOSITE, "--data", DATA_109,
        "--mcmc", our_chain, "--infer", "nutrient",
        "--at", "nutrient=-5:0.5:5;PersonID=0;StoolPairs=0",
        "--output", str(out),
    ])
    assert rc == 0
    pred = pd.read_csv(out, sep="\t")
    # grid columns follow formula varname order; schema cols per test/pred.jl:11-14
    assert set(pred.columns) == {
        "nutrient", "PersonID", "StoolPairs", "ymu", "yQ050", "yQ950"
    }
    assert list(pred.columns[-3:]) == ["ymu", "yQ050", "yQ950"]
    assert len(pred) == 21
    pred = pred.sort_values("nutrient").reset_index(drop=True)
    assert (pred["yQ050"] < pred["ymu"]).all() and (pred["ymu"] < pred["yQ950"]).all()
    # the real data has NO nutrient effect (corr(bug, nutrient) = 0.007), so
    # the posterior mean must be near-flat and near-zero, with a wide band
    # (unseen category code 0 -> full Cat*Cat + Cat + Noise prior variance)
    assert pred["ymu"].abs().max() < 0.5
    assert ((pred["yQ950"] - pred["yQ050"]) > 1.0).all()


def test_sample_posterior_on_real_fixture(tmp_path):
    """sample --data (legacy posterior mode) on the real table: draw at the
    observed design points, conditioned on the 921 observations."""
    from gaplac_tpu.cli.main import main

    out = tmp_path / "post.tsv"
    rc = main([
        "--platform", "cpu", "sample", COMPOSITE,
        "--data", DATA_109, "--atdata", DATA_109, "--seed", "1",
        "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert len(df) == 921
    data = pd.read_csv(DATA_109, sep="\t")
    # a posterior DRAW at the training points tracks the data: the default
    # unit Noise + unit obs hyperparams shrink the mean ~2x and re-add unit
    # draw noise, so r ≈ 0.4 — well above the r ≈ 0 of a prior draw
    r = np.corrcoef(df["bug"], data["bug"])[0, 1]
    assert r > 0.25, r


def test_fitplot_on_real_fixture(our_chain, tmp_path):
    from gaplac_tpu.cli.main import main

    out = tmp_path / "fit.png"
    rc = main([
        "--platform", "cpu", "fitplot", COMPOSITE, "--data", DATA_109,
        "--mcmc", our_chain, "--infer", "nutrient", "--output", str(out),
    ])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 10000
