"""--approx auto routing (inference/routing.py): each measured crossover
from benchmarks/results_v5e.txt becomes an asserted decision, plus the
SqExp/RQ sde lengthscale accuracy guard (VERDICT r4 tasks 2 & 5)."""

import numpy as np
import pytest

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.inference.routing import (
    DENSE_HIGH_D_MAX_N,
    DENSE_MAX_N,
    choose_approx,
    sde_lengthscale_guard,
    sde_structure_info,
)
from gaplac_tpu.kernels.covariance import compile_formula


def _ck(formula):
    return compile_formula(parse_formula(formula).formula)


def _X(n, cols=1, span=10.0, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, span, n))
    return np.tile(x[:, None], (1, cols))


def test_small_n_stays_dense():
    ck = _ck("y ~| SqExp(:x)")
    assert choose_approx(ck, _X(500), "mcmc") == "none"
    assert choose_approx(ck, _X(DENSE_MAX_N), "mcmc") == "none"


def test_large_n_state_space_routes_sde():
    for f in ("y ~| OU(:x)", "y ~| SqExp(:x)", "y ~| Matern32(:x) + Noise"):
        ck = _ck(f)
        assert choose_approx(ck, _X(8192), "mcmc") == "sde", f
        assert choose_approx(ck, _X(8192), "select") == "sde", f


def test_large_n_no_ssm_form_routes_rff():
    # SqExp * SqExp on two different columns: tensor product across columns
    # has no 1-D state-space form -> feature path
    ck = _ck("y ~| SqExp(:x) * SqExp(:z)")
    rng = np.random.default_rng(1)
    X = rng.uniform(0, 10, (8192, 2))
    assert choose_approx(ck, X, "mcmc") == "rff"
    assert choose_approx(ck, X[:500], "mcmc") == "none"


def test_high_d_product_sampling_dense_predict_sde():
    # quasi-periodic: Periodic(J=10, d=21) * Matern32 (d=2) -> d=42 — the
    # d^3-bound regime (results_v5e.txt:192-202)
    ck = _ck("y ~| Periodic(:x; p=3.0) * Matern32(:x)")
    X = _X(16384, cols=2)
    d, approximate, _ = sde_structure_info(ck, X)
    assert d == 42 and approximate
    # gradient-based commands: dense while feasible, rff beyond
    assert choose_approx(ck, X, "mcmc") == "none"
    assert choose_approx(ck, _X(DENSE_HIGH_D_MAX_N + 1, cols=2), "mcmc") == "rff"
    # forward-only commands keep the sde smoother at any n
    assert choose_approx(ck, X, "predict") == "sde"
    assert choose_approx(ck, _X(1 << 17, cols=2), "fitplot") == "sde"


def test_nongaussian_routing():
    spec = parse_formula("y : Bernoulli ~| OU(:x)")
    ck = compile_formula(spec.formula)
    # large n + sde form: the whitened/Laplace state-space path
    assert choose_approx(ck, _X(8192), "mcmc",
                         likelihood=spec.likelihood) == "sde"
    # no sde form + large n: Laplace keeps NUTS dim at #hyperparams
    spec2 = parse_formula("y : Bernoulli ~| SqExp(:x) * SqExp(:z)")
    ck2 = compile_formula(spec2.formula)
    rng = np.random.default_rng(2)
    X2 = rng.uniform(0, 10, (8192, 2))
    assert choose_approx(ck2, X2, "mcmc", likelihood=spec2.likelihood) == "laplace"
    # small n: exact whitened path
    assert choose_approx(ck2, X2[:300], "mcmc",
                         likelihood=spec2.likelihood) == "none"


def test_structure_info_reports_reason():
    ck = _ck("y ~| SqExp(:x) * SqExp(:z)")
    rng = np.random.default_rng(3)
    d, approx, reason = sde_structure_info(ck, rng.uniform(0, 1, (100, 2)))
    assert d is None and isinstance(reason, str) and "sde" in reason


def test_lengthscale_guard_fires_and_stays_silent():
    ck = _ck("y ~| SqExp(:x)")
    X = _X(200, span=10.0)
    _, _, st = sde_structure_info(ck, X)
    groups = (tuple(range(ck.n_leaves)),)
    # posterior mass around l ~ 4 > span/3 ~ 3.33: must warn
    bad = np.full((2, 50, 1), 4.0) + np.random.default_rng(0).normal(
        0, 0.2, (2, 50, 1))
    msg = sde_lengthscale_guard(ck, st, X, bad, groups)
    assert msg is not None and "span/3" in msg
    # guide-regime mass around l ~ 1.5: silent
    good = np.full((2, 50, 1), 1.5)
    assert sde_lengthscale_guard(ck, st, X, good, groups) is None
    # OU-only formulas have no SqExp/RQ leaf: silent even at huge l
    ck_ou = _ck("y ~| OU(:x)")
    _, _, st_ou = sde_structure_info(ck_ou, X)
    assert sde_lengthscale_guard(ck_ou, st_ou, X, bad, groups) is None


def test_cli_auto_mcmc_small_n(tmp_path):
    """End-to-end: --approx auto on a small-n mcmc resolves to the dense
    path and runs; the sde guard machinery stays out of the way."""
    import pandas as pd

    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(5)
    n = 24
    x = np.sort(rng.uniform(0, 10, n))
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": np.sin(x) + rng.normal(0, 0.3, n)}).to_csv(
        data, sep="\t", index=False)
    out = tmp_path / "c.tsv"
    rc = main(["--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data",
               str(data), "--infer", "x", "--approx", "auto",
               "--samples", "6", "--warmup", "10", "--seed", "0",
               "--output", str(out)])
    assert rc == 0
    assert np.isfinite(pd.read_csv(out, sep="\t")["lp"]).all()


def test_cli_auto_select_and_predict(tmp_path):
    import pandas as pd

    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(6)
    n = 40
    x = np.sort(rng.uniform(0, 10, n))
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": np.sin(x) + rng.normal(0, 0.3, n)}).to_csv(
        data, sep="\t", index=False)
    rc = main(["--platform", "cpu", "select", "--formulae", "y ~| SqExp(:x)",
               "y ~| OU(:x)", "--data", str(data), "--approx", "auto"])
    assert rc == 0
    out = tmp_path / "p.tsv"
    rc = main(["--platform", "cpu", "predict", "y ~| OU(:x)", "--data",
               str(data), "--at", "x=0:1:9", "--approx", "auto",
               "--output", str(out)])
    assert rc == 0
    pdf = pd.read_csv(out, sep="\t")
    assert {"ymu", "yQ050", "yQ950"} <= set(pdf.columns)


def test_cli_sde_guard_fires_end_to_end(tmp_path, capsys):
    """mcmc --approx sde on long-lengthscale data (posterior l well above
    span/3) prints the accuracy-guard warning; the guide-regime run in
    test_cli_auto_mcmc_small_n stays silent (asserted there via rc/schema)."""
    import pandas as pd

    from gaplac_tpu.cli.main import main

    rng = np.random.default_rng(8)
    n = 30
    x = np.sort(rng.uniform(0, 6.0, n))           # span 6 -> threshold 2
    # nearly-linear smooth trend: posterior SqExp lengthscale sits >> 2
    y = 0.5 * x + rng.normal(0, 0.05, n)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": y}).to_csv(data, sep="\t", index=False)
    out = tmp_path / "c.tsv"
    rc = main(["--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data",
               str(data), "--infer", "x", "--approx", "sde",
               "--samples", "30", "--warmup", "60", "--seed", "1",
               "--output", str(out)])
    assert rc == 0
    captured = capsys.readouterr()
    assert "accuracy guard" in captured.out
