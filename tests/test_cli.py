"""CLI integration tests — the guide workflow (README.md) end-to-end,
in-process via gaplac_tpu.cli.main.main()."""

import numpy as np
import pandas as pd
import pytest

from gaplac_tpu.cli.main import main


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    path = d / "data.tsv"
    rc = main([
        "--platform", "cpu", "sample", "y :~| SqExp(:x; l=1.5)",
        "--at", "x = rand(Uniform(-5,5), 40)", "--seed", "11",
        "--output", str(path),
    ])
    assert rc == 0
    return str(path)


def test_sample_output_schema(data_file):
    df = pd.read_csv(data_file, sep="\t")
    assert list(df.columns) == ["x", "y"]
    assert len(df) == 40
    assert df["x"].between(-5, 5).all()


def test_sample_grid_and_csv(tmp_path):
    out = tmp_path / "grid.csv"
    rc = main([
        "--platform", "cpu", "sample", "z :~| SqExp(:t) * Cat(:g)",
        "--at", "t=0:1:3; g=[1,2]", "--seed", "0", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out)
    # Cartesian grid: first range varies fastest (ref: utils.jl:1-6)
    assert list(df.columns) == ["t", "g", "z"]
    assert len(df) == 8
    np.testing.assert_array_equal(df["t"][:4], [0, 1, 2, 3])
    np.testing.assert_array_equal(df["g"][:4], [1, 1, 1, 1])


def test_sample_bad_output_extension(tmp_path):
    rc = main([
        "--platform", "cpu", "sample", "y :~| SqExp(:x)",
        "--at", "x=0:1:2", "--output", str(tmp_path / "foo.parquet"),
    ])
    assert rc == 2  # ref: error("--output arg must be '.tsv' or '.csv'")


@pytest.fixture(scope="module")
def chain_files(data_file, tmp_path_factory):
    d = tmp_path_factory.mktemp("chains")
    c1, c2 = d / "mcmc.tsv", d / "mcmc_ou.tsv"
    for formula, path, seed in [("y ~| SqExp(:x)", c1, "1"), ("y ~| OU(:x)", c2, "2")]:
        rc = main([
            "--platform", "cpu", "mcmc", formula, "--data", data_file,
            "--infer", "x", "--samples", "150", "--warmup", "200",
            "--seed", seed, "--output", str(path),
        ])
        assert rc == 0
    return str(c1), str(c2)


def test_mcmc_chain_schema(chain_files):
    df = pd.read_csv(chain_files[0], sep="\t")
    # reference chain schema: iteration, hyperparam ℓ, fx[i], lp (mcmc.jl:42)
    for col in ["iteration", "chain", "ℓ", "fx[1]", "fx[40]", "lp"]:
        assert col in df.columns, col
    assert len(df) == 150
    assert (df["ℓ"] > 0).all() and (df["ℓ"] < 20).all()
    assert df["lp"].between(-200, 0).all()


def test_select_chains_favors_sqexp(chain_files, capsys):
    rc = main(["--platform", "cpu", "select", "--chains", chain_files[0], chain_files[1]])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Log2 Bayes" in out
    bayes = float(out.split("**Log2 Bayes**:")[1].splitlines()[0])
    assert bayes > 0  # data generated from SqExp; guide value ~8.4


def test_select_formulae(data_file, capsys):
    rc = main([
        "--platform", "cpu", "select",
        "--formulae", "y ~| SqExp(:x, l=2)", "y ~| SqExp(:x, l=1)",
        "--data", data_file,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Log2 Bayes" in out


def test_select_both_modes_errors(chain_files, data_file):
    rc = main([
        "--platform", "cpu", "select", "--chains", *chain_files,
        "--formulae", "y ~| SqExp(:x)", "y ~| OU(:x)", "--data", data_file,
    ])
    assert rc == 2


def test_select_legacy_chain_format(tmp_path, capsys):
    # legacy fixtures: comma-delimited despite .tsv name, lπ column
    # (test/testin/mcmc_109.tsv:1; SURVEY.md §2.3.2)
    for name, lp in [("a.tsv", -700.0), ("b.tsv", -710.0)]:
        pd.DataFrame({"θc[σ2]": [1.0, 2.0], "lπ": [lp, lp - 1]}).to_csv(
            tmp_path / name, index=False
        )
    rc = main([
        "--platform", "cpu", "select", "--chains",
        str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    bayes = float(out.split("**Log2 Bayes**:")[1].splitlines()[0])
    assert 5 < bayes < 15  # ≈ 10 (difference of harmonic-mean lps)


def test_predict_schema(data_file, chain_files, tmp_path):
    out = tmp_path / "pred.tsv"
    rc = main([
        "--platform", "cpu", "predict", "y ~| SqExp(:x)", "--data", data_file,
        "--mcmc", chain_files[0], "--infer", "x",
        "--at", "x=-5:0.5:5", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert list(df.columns) == ["x", "ymu", "yQ050", "yQ950"]  # test/pred.jl:11-14
    assert len(df) == 21
    assert (df["yQ050"] < df["ymu"]).all() and (df["ymu"] < df["yQ950"]).all()


def test_fitplot(data_file, tmp_path):
    out = tmp_path / "fit.png"
    rc = main([
        "--platform", "cpu", "fitplot", "y ~| SqExp(:x) + Linear(:x)",
        "--data", data_file, "-o", str(out),
    ])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 10000


def test_mcmc_multichain_and_resume(data_file, tmp_path):
    chk = tmp_path / "state"
    out1 = tmp_path / "c1.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", data_file,
        "--infer", "x", "--samples", "60", "--warmup", "150", "--chains", "2",
        "--seed", "3", "--output", str(out1), "--checkpoint", str(chk),
    ])
    assert rc == 0
    df = pd.read_csv(out1, sep="\t")
    assert set(df["chain"]) == {1, 2}
    assert len(df) == 120
    # resume: extends without warmup
    out2 = tmp_path / "c2.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", data_file,
        "--infer", "x", "--samples", "30", "--chains", "2", "--seed", "4",
        "--resume", str(chk) + ".npz", "--output", str(out2),
    ])
    assert rc == 0
    assert len(pd.read_csv(out2, sep="\t")) == 60


def test_mcmc_prior_flag(data_file, tmp_path):
    """--prior LogNormal routes through the registry end-to-end; an extreme
    prior (mass near 0.2) visibly drags the posterior ℓ down vs Uniform."""
    out = tmp_path / "ln.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", data_file,
        "--infer", "x", "--samples", "100", "--warmup", "150", "--seed", "5",
        "--prior", "LogNormal(-1.6, 0.3)", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert df["ℓ"].mean() < 1.0  # data says ~1.5; the tight prior wins

    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", data_file,
        "--infer", "x", "--samples", "5", "--prior", "Cauchy(0,1)",
    ])
    assert rc == 2  # unknown prior is a clean CLI error


def test_mcmc_missing_column(data_file):
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:nope)", "--data", data_file,
        "--infer", "nope", "--samples", "10",
    ])
    assert rc == 2


def test_sample_plot_integer_column(tmp_path):
    """Integer data columns must not truncate fractional hyperparameter
    defaults in sample_plot (l=0.5 -> 0 gave an all-NaN band)."""
    import matplotlib
    matplotlib.use("Agg")
    import numpy as np

    from gaplac_tpu.dsl import parse_formula
    from gaplac_tpu.kernels.covariance import compile_formula
    from gaplac_tpu.viz.plots import sample_plot

    rng = np.random.default_rng(0)
    x = rng.integers(0, 10, 25)          # int64 column
    y = np.sin(x / 3.0) + rng.normal(0, 0.1, 25)
    ck = compile_formula(parse_formula("y ~| SqExp(:t; l=0.5)").formula)
    fig = sample_plot(ck, x, y, "t", "y")
    line = fig.axes[0].lines[0]           # posterior-mean line
    assert np.isfinite(np.asarray(line.get_ydata())).all()
