"""Extended CLI coverage: composite longitudinal formulas (the reference's
real-data shape, test/pred.jl:3), non-Gaussian likelihoods, outlier removal,
profiling flag."""

import numpy as np
import pandas as pd
import pytest

from gaplac_tpu.cli.main import main


@pytest.fixture(scope="module")
def longitudinal_data(tmp_path_factory):
    """Synthetic microbiome-style table: bug ~ per-person effect + nutrient
    trend + noise (columns mirror input_pair_109.tsv's shape without copying
    reference data)."""
    rng = np.random.default_rng(0)
    n_person, n_rep = 12, 8
    person = np.repeat(np.arange(n_person), n_rep)
    pair = rng.integers(0, 2, size=n_person * n_rep)
    nutrient = rng.normal(size=n_person * n_rep)
    person_eff = rng.normal(0, 1.0, size=n_person)[person]
    bug = person_eff + 0.8 * nutrient + rng.normal(0, 0.5, size=n_person * n_rep)
    df = pd.DataFrame({
        "SampleID": [f"s{i}" for i in range(len(bug))],
        "bug": bug,
        "nutrient": nutrient,
        "StoolPairs": pair,
        "PersonID": [f"p{int(p)}" for p in person],  # string categorical
    })
    d = tmp_path_factory.mktemp("long")
    path = d / "long.tsv"
    df.to_csv(path, sep="\t", index=False)
    return str(path)


def test_composite_categorical_mcmc(longitudinal_data, tmp_path, capsys):
    # legacy composite formula with string Cat columns and bare Noise
    out = tmp_path / "chain.tsv"
    rc = main([
        "--platform", "cpu", "mcmc",
        "bug :~| Cat(PersonID) * Cat(StoolPairs) + Cat(PersonID) + Linear(nutrient) + Noise",
        "--data", longitudinal_data, "--infer", "nutrient",
        "--samples", "50", "--warmup", "100", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert "lp" in df.columns and np.isfinite(df["lp"]).all()
    # lp scale sanity: joint density of ~96 obs should be O(-100..-400)
    assert -2000 < df["lp"].mean() < 0


def test_select_formulae_composite(longitudinal_data, capsys):
    rc = main([
        "--platform", "cpu", "select", "--formulae",
        "bug :~| Cat(PersonID) + Linear(nutrient)",
        "bug :~| Linear(nutrient)",
        "--data", longitudinal_data,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    bayes = float(out.split("**Log2 Bayes**:")[1].splitlines()[0])
    assert bayes > 5  # person effects are real -> strong evidence for model 1


def test_bernoulli_mcmc_cli(tmp_path):
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(-3, 3, 40))
    f = np.sin(1.5 * x) * 2
    yb = (rng.uniform(size=40) < 1 / (1 + np.exp(-f))).astype(int)
    data = tmp_path / "bin.tsv"
    pd.DataFrame({"x": x, "y": yb}).to_csv(data, sep="\t", index=False)
    out = tmp_path / "chain.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y : Bernoulli ~| SqExp(:x)",
        "--data", str(data), "--infer", "x", "--samples", "50",
        "--warmup", "100", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert np.isfinite(df["lp"]).all()
    assert (df["ℓ"] > 0).all()


def test_outlier_fence(tmp_path, capsys):
    rng = np.random.default_rng(1)
    x = rng.uniform(-5, 5, 60)
    y = np.sin(x)
    y[0] = 500.0  # gross outlier
    data = tmp_path / "o.tsv"
    pd.DataFrame({"x": x, "y": y}).to_csv(data, sep="\t", index=False)
    out = tmp_path / "chain.tsv"
    rc = main([
        "--platform", "cpu", "-v", "mcmc", "y ~| SqExp(:x)", "--data", str(data),
        "--infer", "x", "--samples", "30", "--warmup", "60",
        "--rmv-outliers", "fence", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    # 59 rows kept -> fx[59] exists, fx[60] doesn't
    assert "fx[59]" in df.columns and "fx[60]" not in df.columns


def test_profile_flag(tmp_path, capsys):
    data = tmp_path / "d.tsv"
    rng = np.random.default_rng(2)
    pd.DataFrame({"x": rng.uniform(-5, 5, 30), "y": rng.normal(size=30)}).to_csv(
        data, sep="\t", index=False
    )
    rc = main([
        "--platform", "cpu", "--profile", "mcmc", "y ~| SqExp(:x)",
        "--data", str(data), "--infer", "x", "--samples", "20", "--warmup", "40",
        "--output", str(tmp_path / "c.tsv"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "phase breakdown" in out
    assert "mcmc.sample+compile" in out


def test_studentt_likelihood_mcmc(tmp_path):
    rng = np.random.default_rng(4)
    x = rng.uniform(-4, 4, 35)
    y = np.sin(x) + rng.standard_t(3, size=35) * 0.3
    data = tmp_path / "t.tsv"
    pd.DataFrame({"x": x, "y": y}).to_csv(data, sep="\t", index=False)
    rc = main([
        "--platform", "cpu", "mcmc", "y : StudentT(4) ~| SqExp(:x)",
        "--data", str(data), "--infer", "x", "--samples", "40", "--warmup", "80",
        "--output", str(tmp_path / "c.tsv"),
    ])
    assert rc == 0


def test_chain_extension_from_table(tmp_path):
    # legacy --mcmc chain-extension semantics: --resume <chain.tsv>
    rng = np.random.default_rng(5)
    x = rng.uniform(-5, 5, 30)
    y = np.sin(x)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": y}).to_csv(data, sep="\t", index=False)
    c1 = tmp_path / "c1.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", str(data),
        "--infer", "x", "--samples", "30", "--warmup", "80", "--output", str(c1),
    ])
    assert rc == 0
    c2 = tmp_path / "c2.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", str(data),
        "--infer", "x", "--samples", "20", "--resume", str(c1), "--output", str(c2),
    ])
    assert rc == 0
    assert len(pd.read_csv(c2, sep="\t")) == 20
    # latent (no-marginalize) extension exercises the fx -> z inversion
    c3 = tmp_path / "c3.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", str(data),
        "--infer", "x", "--samples", "15", "--no-marginalize",
        "--resume", str(c1), "--output", str(c3),
    ])
    assert rc == 0
    assert np.isfinite(pd.read_csv(c3, sep="\t")["lp"]).all()


def test_pervar_infer_mode(tmp_path):
    rng = np.random.default_rng(6)
    n = 40
    t = rng.uniform(0, 10, n)
    x = rng.uniform(-3, 3, n)
    y = np.sin(t) + 0.5 * x + rng.normal(0, 0.3, n)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"t": t, "x": x, "y": y}).to_csv(data, sep="\t", index=False)
    out = tmp_path / "c.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:t) + OU(:x)", "--data", str(data),
        "--infer", "t", "x", "--infer-mode", "pervar",
        "--samples", "30", "--warmup", "80", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    # two hyperparameter columns: one per inferred variable
    assert "ℓ" in df.columns and "ℓ_2" in df.columns


def test_predict_consistent_categorical_codes(tmp_path):
    # regression: train/test tables must share categorical codes
    rng = np.random.default_rng(7)
    train = pd.DataFrame({
        "t": rng.uniform(0, 10, 30),
        "g": (["b"] * 15 + ["a"] * 15),
        "y": np.r_[np.full(15, 5.0), np.full(15, -5.0)] + rng.normal(0, 0.2, 30),
    })
    test = pd.DataFrame({"t": np.full(4, 5.0), "g": ["a", "b", "a", "b"]})
    tr, te = tmp_path / "train.tsv", tmp_path / "test.tsv"
    train.to_csv(tr, sep="\t", index=False)
    test.to_csv(te, sep="\t", index=False)
    out = tmp_path / "pred.tsv"
    rc = main([
        "--platform", "cpu", "predict", "y ~| SqExp(:t) + Cat(:g)",
        "--data", str(tr), "--atdata", str(te), "--output", str(out),
    ])
    assert rc == 0
    pred = pd.read_csv(out, sep="\t")
    # group a ~ -5, group b ~ +5; codes must align even though the test
    # table lists 'a' first while training lists 'b' first
    assert pred["ymu"][0] < -2 and pred["ymu"][2] < -2   # 'a' rows
    assert pred["ymu"][1] > 2 and pred["ymu"][3] > 2     # 'b' rows


def test_sample_repeated_variable_single_axis(tmp_path):
    out = tmp_path / "s.tsv"
    rc = main([
        "--platform", "cpu", "sample", "y :~| SqExp(:x) * OU(:x)",
        "--at", "x=0:1:9", "--seed", "0", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert len(df) == 10          # one axis, not a 100-row product grid
    assert list(df.columns) == ["x", "y"]


def test_predict_pervar_chain(tmp_path):
    rng = np.random.default_rng(8)
    n = 30
    t = rng.uniform(0, 10, n)
    x = rng.uniform(-3, 3, n)
    y = np.sin(t) + 0.5 * x
    data = tmp_path / "d.tsv"
    pd.DataFrame({"t": t, "x": x, "y": y}).to_csv(data, sep="\t", index=False)
    chain = tmp_path / "c.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:t) + OU(:x)", "--data", str(data),
        "--infer", "t", "x", "--infer-mode", "pervar",
        "--samples", "20", "--warmup", "60", "--output", str(chain),
    ])
    assert rc == 0
    out = tmp_path / "p.tsv"
    rc = main([
        "--platform", "cpu", "predict", "y ~| SqExp(:t) + OU(:x)",
        "--data", str(data), "--mcmc", str(chain),
        "--infer", "t", "x", "--infer-mode", "pervar",
        "--at", "t=0:2:10;x=0", "--output", str(out),
    ])
    assert rc == 0
    assert np.isfinite(pd.read_csv(out, sep="\t")["ymu"]).all()


def test_mcmc_progress_flag(tmp_path, capfd):
    """--progress emits in-scan host-callback ticks (ref: Turing
    progress=true, mcmc.jl:41)."""
    import pandas as pd
    import numpy as np

    from gaplac_tpu.cli.main import main

    d = tmp_path / "d.tsv"
    rng = np.random.default_rng(0)
    pd.DataFrame({"x": rng.uniform(-3, 3, 20), "y": rng.normal(size=20)}).to_csv(
        d, sep="\t", index=False
    )
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", str(d),
        "--infer", "x", "--samples", "10", "--warmup", "10", "--progress",
        "--output", str(tmp_path / "c.tsv"),
    ])
    assert rc == 0
    err = capfd.readouterr().err
    assert "[warmup] 10/10" in err
    assert "[sampling] 10/10" in err


def test_extended_kernel_mcmc_predict_no_infer(tmp_path):
    """mcmc + predict with an extended kernel (Matern52), predict WITHOUT
    --infer: default_slot_groups must treat Matern/Periodic/RQ lengthscales
    as chain-sampled hyperparameters (one shared l, the reference default)."""
    rng = np.random.default_rng(3)
    n = 30
    t = rng.uniform(0, 10, n)
    y = np.sin(t) + rng.normal(0, 0.3, n)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"t": t, "y": y}).to_csv(data, sep="\t", index=False)
    chain = tmp_path / "c.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| Matern52(:t) + Periodic(:t; p=6.28)",
        "--data", str(data), "--infer", "t",
        "--samples", "20", "--warmup", "60", "--output", str(chain),
    ])
    assert rc == 0
    out = tmp_path / "p.tsv"
    rc = main([
        "--platform", "cpu", "predict", "y ~| Matern52(:t) + Periodic(:t; p=6.28)",
        "--data", str(data), "--mcmc", str(chain),
        "--at", "t=0:2:10", "--output", str(out),
    ])
    assert rc == 0
    pred = pd.read_csv(out, sep="\t")
    assert np.isfinite(pred["ymu"]).all()
    assert (pred["yQ050"] <= pred["yQ950"]).all()


def test_fitplot_extended_kernel_chain_and_string_cat(tmp_path):
    """fitplot --mcmc must apply chain hyperparameters to extended kernels
    (it hardcoded SqExp/OU kinds) and must factorize string categorical
    x-axes instead of crashing on float conversion."""
    rng = np.random.default_rng(5)
    n = 24
    t = rng.uniform(0, 8, n)
    person = np.repeat(["a", "b", "c"], n // 3)
    y = np.sin(t) + rng.normal(0, 0.3, n)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"t": t, "person": person, "y": y}).to_csv(data, sep="\t", index=False)
    chain = tmp_path / "c.tsv"
    formula = "y ~| Matern52(:t) + Cat(:person)"
    rc = main([
        "--platform", "cpu", "mcmc", formula, "--data", str(data),
        "--infer", "t", "--samples", "15", "--warmup", "40", "--output", str(chain),
    ])
    assert rc == 0
    out = tmp_path / "f.png"
    rc = main([
        "--platform", "cpu", "fitplot", formula, "--data", str(data),
        "--mcmc", str(chain), "--output", str(out),
    ])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 0


def test_mcmc_burnin_exceeds_samples_rejected(tmp_path):
    rng = np.random.default_rng(0)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": rng.uniform(-3, 3, 15), "y": rng.normal(size=15)}).to_csv(
        data, sep="\t", index=False
    )
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", str(data),
        "--infer", "x", "--samples", "10", "--burnin", "10",
        "--output", str(tmp_path / "c.tsv"),
    ])
    assert rc != 0  # clean error, not a post-run crash

def test_mcmc_no_latents_omits_fx_columns(tmp_path):
    """--no-latents keeps the chain table at O(#hyper) columns (the large-n
    usability flag for the --approx rff path) while lp stays the reference
    joint density."""
    rng = np.random.default_rng(6)
    x = rng.uniform(-5, 5, 25)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": np.sin(x)}).to_csv(data, sep="\t", index=False)
    out = tmp_path / "c.tsv"
    rc = main([
        "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", str(data),
        "--infer", "x", "--samples", "20", "--warmup", "60",
        "--approx", "rff", "--rff-features", "64", "--no-latents",
        "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert not any(c.startswith("fx[") for c in df.columns)
    assert np.isfinite(df["lp"]).all()


def test_approx_command_matrix_unsupported_cells(tmp_path):
    """README's approx×command matrix: every unsupported cell raises an
    early error (rc=2 with a ValueError message), never a silent fallback
    (VERDICT r2 task 9)."""
    import pandas as pd

    rng = np.random.default_rng(0)
    n = 30
    x = np.sort(rng.uniform(0, 5, n))
    df = pd.DataFrame({
        "x": x,
        "y": np.sin(x) + rng.normal(0, 0.3, n),
        "z": rng.integers(0, 2, n),  # Bernoulli response
    })
    data = tmp_path / "d.tsv"
    df.to_csv(data, sep="\t", index=False)
    chain = tmp_path / "chain.tsv"
    rc = main(["--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data",
               str(data), "--infer", "x", "--samples", "10", "--warmup", "20",
               "--output", str(chain), "--seed", "0"])
    assert rc == 0

    bad = [
        # laplace needs a non-Gaussian likelihood
        ["mcmc", "y ~| SqExp(:x)", "--data", str(data), "--infer", "x",
         "--approx", "laplace"],
        # rff needs a Gaussian likelihood (sde now Laplace-marginalizes)
        ["mcmc", "z ~ Bernoulli | SqExp(:x)", "--data", str(data), "--infer",
         "x", "--approx", "rff"],
        # --infer-extra × rff: static shape parameters required
        ["mcmc", "y ~| Periodic(:x)", "--data", str(data), "--infer", "x",
         "--infer-extra", "x", "--approx", "rff"],
        ["predict", "y ~| Periodic(:x)", "--data", str(data), "--mcmc",
         str(chain), "--infer", "x", "--infer-extra", "x", "--approx", "rff",
         "--at", "x=0:1:5", "--output", str(tmp_path / "p.tsv")],
        ["fitplot", "y ~| Periodic(:x)", "--data", str(data), "--mcmc",
         str(chain), "--infer", "x", "--infer-extra", "x", "--approx", "rff",
         "--output", str(tmp_path / "f.png")],
        # sde-unsupported formulas raise in every command that takes sde
        # (a Noise factor inside a product has no state-space form; RQ is
        # supported since round 3 via the Gamma-mixture block)
        ["mcmc", "y ~| OU(:x) * Noise", "--data", str(data), "--infer", "x",
         "--approx", "sde"],
        ["sample", "y :~| OU(:x) * Noise", "--at", "x=0:1:5", "--approx",
         "sde", "--output", str(tmp_path / "s.tsv")],
        ["predict", "y ~| OU(:x) * Noise", "--data", str(data), "--at",
         "x=0:1:5", "--approx", "sde", "--output", str(tmp_path / "p2.tsv")],
        ["fitplot", "y ~| OU(:x) * Noise", "--data", str(data), "--approx",
         "sde", "--output", str(tmp_path / "f2.png")],
        # --infer-extra × RQ × sde: alpha's quadrature nodes are static
        ["mcmc", "y ~| RQ(:x)", "--data", str(data), "--infer", "x",
         "--infer-extra", "x", "--approx", "sde"],
    ]
    for argv in bad:
        rc = main(["--platform", "cpu"] + argv)
        assert rc == 2, argv


def test_cli_mcmc_hmc_sampler(tmp_path):
    """--sampler hmc (fixed-trajectory static-scan HMC): marginalized dense
    path AND the --approx sde marginal (the crash-safe large-n pipeline:
    no while_loop anywhere in the compiled program)."""
    import pandas as pd

    rng = np.random.default_rng(3)
    n = 40
    x = np.sort(rng.uniform(0, 10, n))
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": np.sin(x / 1.5) + rng.normal(0, 0.3, n)}).to_csv(
        data, sep="\t", index=False)

    for extra in ([], ["--approx", "sde"]):
        out = tmp_path / f"chain{len(extra)}.tsv"
        rc = main([
            "--platform", "cpu", "mcmc", "y ~| OU(:x)", "--data", str(data),
            "--infer", "x", "--samples", "15", "--warmup", "20",
            "--sampler", "hmc", "--leapfrogs", "8", "--chains", "4",
            "--seed", "5", "--output", str(out),
        ] + extra)
        assert rc == 0, extra
        cdf = pd.read_csv(out, sep="\t")
        assert "ℓ" in cdf.columns and "lp" in cdf.columns
        assert np.isfinite(cdf["lp"]).all()
        assert len(cdf) == 15 * 4


def test_cli_chees_hmc_checkpoint_resume(tmp_path):
    """--checkpoint/--resume on the lockstep samplers: npz resume restores
    adapted (eps, mass[, T]) and skips warmup; .tsv resume warm-starts
    positions (chain extension)."""
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 30
    x = np.sort(rng.uniform(0, 10, n))
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": np.sin(x) + rng.normal(0, 0.3, n)}).to_csv(
        data, sep="\t", index=False)

    for samp in ("chees", "hmc"):
        chain = tmp_path / f"{samp}_chain.tsv"
        ckpt = tmp_path / f"{samp}_state.npz"
        base = ["--platform", "cpu", "mcmc", "y ~| OU(:x)", "--data",
                str(data), "--infer", "x", "--sampler", samp,
                "--chains", "4" if samp == "hmc" else "8", "--seed", "11"]
        rc = main(base + ["--samples", "10", "--warmup", "20",
                          "--checkpoint", str(ckpt),
                          "--output", str(chain)])
        assert rc == 0
        assert ckpt.exists()
        z = np.load(ckpt)
        assert "step_size" in z.files and "inv_mass" in z.files
        if samp == "chees":
            assert "traj_length" in z.files

        # npz resume: warmup skipped, continues finite
        out2 = tmp_path / f"{samp}_resumed.tsv"
        rc = main(base + ["--samples", "8", "--resume", str(ckpt),
                          "--output", str(out2)])
        assert rc == 0
        cdf = pd.read_csv(out2, sep="\t")
        assert np.isfinite(cdf["lp"]).all()
        assert len(cdf) == 8 * (4 if samp == "hmc" else 8)

        # table resume: chain extension path
        out3 = tmp_path / f"{samp}_extended.tsv"
        rc = main(base + ["--samples", "6", "--warmup", "10",
                          "--resume", str(chain), "--output", str(out3)])
        assert rc == 0
        assert np.isfinite(pd.read_csv(out3, sep="\t")["lp"]).all()


def test_cli_lockstep_stats_columns_and_segments(tmp_path):
    """chees/hmc chain tables carry per-draw sampler-stat columns
    (acceptance_rate per chain, adapted step_size, ChEES traj_length), and
    --segments routes hmc through the segmented host-driven driver with
    per-segment checkpoints — same schema, finite output."""
    import pandas as pd

    rng = np.random.default_rng(9)
    n = 25
    x = np.sort(rng.uniform(0, 10, n))
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": np.sin(x) + rng.normal(0, 0.3, n)}).to_csv(
        data, sep="\t", index=False)

    # chees: per-chain acceptance + step_size + traj_length columns
    out = tmp_path / "chees.tsv"
    rc = main(["--platform", "cpu", "mcmc", "y ~| OU(:x)", "--data",
               str(data), "--infer", "x", "--sampler", "chees",
               "--chains", "8", "--samples", "6", "--warmup", "12",
               "--seed", "3", "--output", str(out)])
    assert rc == 0
    cdf = pd.read_csv(out, sep="\t")
    for col in ("acceptance_rate", "step_size", "traj_length"):
        assert col in cdf.columns, col
    assert ((0.0 <= cdf["acceptance_rate"]) & (cdf["acceptance_rate"] <= 1.0)).all()
    # per-CHAIN stats: chains differ (not the cross-chain mean repeated)
    by_chain = cdf.groupby("chain")["acceptance_rate"].mean()
    assert by_chain.nunique() > 1
    assert cdf["step_size"].nunique() == 1 and (cdf["step_size"] > 0).all()

    # hmc --segments: segmented driver, same schema (no traj_length),
    # checkpoint written by the per-segment callback
    out2 = tmp_path / "hmc_seg.tsv"
    ckpt = tmp_path / "hmc_seg.npz"
    rc = main(["--platform", "cpu", "mcmc", "y ~| OU(:x)", "--data",
               str(data), "--infer", "x", "--sampler", "hmc",
               "--chains", "4", "--samples", "9", "--warmup", "10",
               "--segments", "4", "--seed", "3",
               "--checkpoint", str(ckpt), "--output", str(out2)])
    assert rc == 0
    sdf = pd.read_csv(out2, sep="\t")
    assert "acceptance_rate" in sdf.columns and "step_size" in sdf.columns
    assert "traj_length" not in sdf.columns
    assert np.isfinite(sdf["lp"]).all()
    assert len(sdf) == 9 * 4
    z = np.load(ckpt)
    assert "step_size" in z.files and "inv_mass" in z.files

    # the npz written per-segment resumes cleanly
    out3 = tmp_path / "hmc_seg_resumed.tsv"
    rc = main(["--platform", "cpu", "mcmc", "y ~| OU(:x)", "--data",
               str(data), "--infer", "x", "--sampler", "hmc",
               "--chains", "4", "--samples", "5", "--segments", "4",
               "--seed", "4", "--resume", str(ckpt), "--output", str(out3)])
    assert rc == 0
    assert np.isfinite(pd.read_csv(out3, sep="\t")["lp"]).all()
