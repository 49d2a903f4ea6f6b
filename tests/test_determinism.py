"""Deterministic-RNG replay tests (SURVEY.md §5 sanitizer row: "deterministic
RNG replay tests" stand in for race detection in SPMD JAX)."""

import numpy as np
import pandas as pd

from gaplac_tpu.cli.main import main


def test_mcmc_replay_identical(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-5, 5, 25)
    data = tmp_path / "d.tsv"
    pd.DataFrame({"x": x, "y": np.sin(x)}).to_csv(data, sep="\t", index=False)
    outs = []
    for name in ("a.tsv", "b.tsv"):
        rc = main([
            "--platform", "cpu", "mcmc", "y ~| SqExp(:x)", "--data", str(data),
            "--infer", "x", "--samples", "25", "--warmup", "50", "--seed", "7",
            "--output", str(tmp_path / name),
        ])
        assert rc == 0
        outs.append(pd.read_csv(tmp_path / name, sep="\t"))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_sample_replay_identical(tmp_path):
    outs = []
    for name in ("a.tsv", "b.tsv"):
        rc = main([
            "--platform", "cpu", "sample", "y :~| SqExp(:x; l=1.5)",
            "--at", "x = rand(Uniform(-5,5), 20)", "--seed", "3",
            "--output", str(tmp_path / name),
        ])
        assert rc == 0
        outs.append(pd.read_csv(tmp_path / name, sep="\t"))
    pd.testing.assert_frame_equal(outs[0], outs[1])
