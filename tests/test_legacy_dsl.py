"""Legacy-envelope DSL features (SURVEY.md §2.11 / bin/old_options.jl):

- ``--data`` mini-DSL: ;-separated sources, ``#`` transpose, ``,``/``~``
  delimiter flags, join keys (bin/old_options.jl:32)
- grouped ``--at`` assignments ``var/group=value`` (old_options.jl:87,
  driven in test/oldtests.jl:48)
- ``range(a,b,length=n)`` values, ``1(c)`` constant-kernel spelling
- ``sample --data/--mcmc/--atdata/--plotx`` posterior sampling contract
"""

import numpy as np
import pandas as pd
import pytest

from gaplac_tpu.cli.main import main
from gaplac_tpu.data.io import load_tables
from gaplac_tpu.dsl import build_at_frame, parse_at_ranges, parse_formula
from gaplac_tpu.dsl.ast import Constant
from gaplac_tpu.dsl.ranges import RangeError


# ---------------------------------------------------------------------------
# parser: 1(c) constant spelling
# ---------------------------------------------------------------------------


def test_constant_one_spelling():
    spec = parse_formula("y :~| 1(1) * Cat(:person) * SqExp(:time; l=1)")
    from gaplac_tpu.dsl.ast import leaves

    ls = leaves(spec.formula)
    assert isinstance(ls[0], Constant) and ls[0].c == 1.0


def test_constant_one_bare_and_value():
    spec = parse_formula("y ~| 1(2.5) + SqExp(:x)")
    from gaplac_tpu.dsl.ast import leaves

    assert isinstance(leaves(spec.formula)[0], Constant)
    assert leaves(spec.formula)[0].c == 2.5


# ---------------------------------------------------------------------------
# ranges: range() call, grouped assignments
# ---------------------------------------------------------------------------


def test_range_length_call():
    at = parse_at_ranges("x = range(-5, 5, length=6)")
    np.testing.assert_allclose(at["x"], np.linspace(-5, 5, 6))


def test_parse_at_ranges_rejects_grouped():
    with pytest.raises(RangeError, match="build_at_frame"):
        parse_at_ranges("person=1:3; time/person=1:2")


def test_build_at_frame_grouped_deterministic():
    df = build_at_frame("person=1:3; time/person=range(0,1,length=4)")
    assert list(df.columns) == ["person", "time"]
    assert len(df) == 12  # 3 persons x 4 times
    for g in (1.0, 2.0, 3.0):
        np.testing.assert_allclose(
            df[df["person"] == g]["time"].to_numpy(), np.linspace(0, 1, 4)
        )


def test_build_at_frame_grouped_rand_fresh_per_level():
    df = build_at_frame("person=1:2; t/person=rand(Uniform(0,1), 5)", seed=3)
    t1 = df[df["person"] == 1.0]["t"].to_numpy()
    t2 = df[df["person"] == 2.0]["t"].to_numpy()
    assert len(t1) == len(t2) == 5
    assert not np.allclose(t1, t2)  # fresh draws per group level


def test_build_at_frame_ungrouped_matches_cartesian():
    df = build_at_frame("t=0:1:3; g=[1,2]")
    # first assignment varies fastest (ref: utils.jl:1-6)
    np.testing.assert_array_equal(df["t"][:4], [0, 1, 2, 3])
    np.testing.assert_array_equal(df["g"][:4], [1, 1, 1, 1])
    assert len(df) == 8


def test_build_at_frame_unknown_group():
    with pytest.raises(RangeError, match="not defined before"):
        build_at_frame("time/person=1:2")


# ---------------------------------------------------------------------------
# --data mini-DSL
# ---------------------------------------------------------------------------


@pytest.fixture()
def joined_tables(tmp_path):
    data = tmp_path / "data.tsv"
    pd.DataFrame(
        {"id": ["a", "b", "c"], "x": [1.0, 2.0, 3.0], "y": [0.1, 0.2, 0.3]}
    ).to_csv(data, sep="\t", index=False)
    # wide table: rows are attributes, columns are subject ids
    subjects = tmp_path / "subjects.tsv"
    pd.DataFrame(
        {"attr": ["subjectid", "weight"], "s1": ["a", "70"], "s2": ["b", "80"]}
    ).to_csv(subjects, sep="\t", index=False)
    return str(data), str(subjects)


def test_load_tables_join_with_transpose(joined_tables):
    data, subjects = joined_tables
    df = load_tables(f"id:{data};#subjectid:{subjects}")
    # inner join: only ids a and b survive
    assert len(df) == 2
    assert set(df["id"]) == {"a", "b"}
    assert "weight" in df.columns
    np.testing.assert_allclose(sorted(df["weight"]), [70.0, 80.0])


def test_load_tables_csv_flag(tmp_path):
    p = tmp_path / "weird.dat"
    p.write_text("a,b\n1,2\n3,4\n")
    df = load_tables(f",:{p}")
    assert list(df.columns) == ["a", "b"] and len(df) == 2


def test_load_tables_common_column_join(tmp_path):
    p1, p2 = tmp_path / "l.tsv", tmp_path / "r.tsv"
    pd.DataFrame({"k": [1, 2], "u": [10.0, 20.0]}).to_csv(p1, sep="\t", index=False)
    pd.DataFrame({"k": [2, 3], "v": [5.0, 6.0]}).to_csv(p2, sep="\t", index=False)
    df = load_tables(f"{p1};{p2}")
    assert len(df) == 1 and df["k"].iloc[0] == 2


def test_load_tables_single_plain_path(joined_tables):
    data, _ = joined_tables
    df = load_tables(data)
    assert list(df.columns) == ["id", "x", "y"]


def test_df_output_stdout(capsys):
    from gaplac_tpu.data import df_output

    df_output(pd.DataFrame({"a": [1.5], "b": [2.5]}), "stdout")
    out = capsys.readouterr().out
    assert out.splitlines()[0] == "a\tb"
    assert out.splitlines()[1] == "1.5\t2.5"


# ---------------------------------------------------------------------------
# sample: posterior mode + plotx (legacy contract)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def train_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("legacy_sample")
    path = d / "train.tsv"
    rc = main([
        "--platform", "cpu", "sample", "y :~| SqExp(:x; l=1.5)",
        "--at", "x = rand(Uniform(-5,5), 30)", "--seed", "7",
        "--output", str(path),
    ])
    assert rc == 0
    return str(path)


def test_sample_posterior_conditions_on_data(train_file, tmp_path):
    out = tmp_path / "post.tsv"
    rc = main([
        "--platform", "cpu", "sample", "y :~| SqExp(:x; l=1.5)",
        "--data", train_file, "--at", "x=-5:0.25:5", "--seed", "1",
        "--jitter", "0.01", "--output", str(out),
    ])
    assert rc == 0
    post = pd.read_csv(out, sep="\t")
    train = pd.read_csv(train_file, sep="\t")
    # posterior draws should track the training data: at each training x the
    # posterior sample is far closer to the observed y than a prior draw's
    # typical scale (prior sd = 1)
    interp = np.interp(train["x"], post["x"], post["y"])
    rmse = float(np.sqrt(np.mean((interp - train["y"]) ** 2)))
    assert rmse < 0.6, rmse


def test_sample_grouped_at_with_plotx(tmp_path):
    out = tmp_path / "g.tsv"
    plot = tmp_path / "g.png"
    rc = main([
        "--platform", "cpu", "sample",
        "y :~| 1(1) * Cat(:person) * SqExp(:time; l=1)",
        "--at", "person=1:3;time/person=range(-5,5,length=6)",
        "--seed", "2", "--output", str(out),
        "--plot", str(plot), "--plotx", "time:person",
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert len(df) == 18
    assert set(df["person"]) == {1.0, 2.0, 3.0}
    assert plot.exists() and plot.stat().st_size > 0


def test_sample_requires_at_or_atdata():
    rc = main(["--platform", "cpu", "sample", "y :~| SqExp(:x)"])
    assert rc == 2


def test_sample_atdata(train_file, tmp_path):
    out = tmp_path / "atdata_out.tsv"
    rc = main([
        "--platform", "cpu", "sample", "z :~| SqExp(:x)",
        "--atdata", train_file, "--seed", "5", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert "z" in df.columns and len(df) == 30


# ---------------------------------------------------------------------------
# review-finding regressions
# ---------------------------------------------------------------------------


def test_load_tables_one_sided_key(tmp_path):
    """A key declared on only one source joins against the same-named column
    on the other side; a missing column is a clean ValueError, not KeyError."""
    p1, p2 = tmp_path / "a.tsv", tmp_path / "b.tsv"
    pd.DataFrame({"id": ["a", "b"], "x": [1.0, 2.0]}).to_csv(p1, sep="\t", index=False)
    pd.DataFrame({"id": ["b", "c"], "w": [5.0, 6.0]}).to_csv(p2, sep="\t", index=False)
    df = load_tables(f"{p1};id:{p2}")
    assert len(df) == 1 and df["w"].iloc[0] == 5.0
    pd.DataFrame({"other": ["b"], "w": [5.0]}).to_csv(p2, sep="\t", index=False)
    with pytest.raises(ValueError, match="join column"):
        load_tables(f"{p1};id:{p2}")


def test_load_tables_zero_padded_key_join(tmp_path):
    """Transpose's numeric coercion matches the untransposed side's pandas
    inference, so zero-padded keys join consistently ('007' -> 7 on BOTH
    sides); int-vs-float key dtype mismatches are aligned before merging."""
    data = tmp_path / "d.tsv"
    pd.DataFrame({"sid": ["007", "012"], "x": [1.0, 2.0]}).to_csv(
        data, sep="\t", index=False
    )
    wide = tmp_path / "w.tsv"
    pd.DataFrame(
        {"attr": ["sid", "weight"], "s1": ["007", "70"], "s2": ["012", "80"]}
    ).to_csv(wide, sep="\t", index=False)
    df = load_tables(f"sid:{data};#sid:{wide}")
    assert len(df) == 2
    np.testing.assert_allclose(sorted(df["weight"]), [70.0, 80.0])


def test_load_tables_mixed_text_key_join(tmp_path):
    """A key that is text on one side and numeric on the other still joins
    (string comparison fallback) rather than raising pandas' dtype error."""
    p1, p2 = tmp_path / "a.tsv", tmp_path / "b.tsv"
    pd.DataFrame({"k": ["1", "x2"], "u": [1.0, 2.0]}).to_csv(p1, sep="\t", index=False)
    pd.DataFrame({"k": [1, 3], "v": [5.0, 6.0]}).to_csv(p2, sep="\t", index=False)
    df = load_tables(f"k:{p1};k:{p2}")
    assert len(df) == 1 and df["v"].iloc[0] == 5.0


def test_build_at_frame_formula_order(tmp_path):
    """Base-grid axis order follows the FORMULA variable order (first var
    fastest), not the --at assignment order (ref: sample.jl:23)."""
    spec = parse_formula("y :~| SqExp(:x) * Cat(:g)")
    df = build_at_frame("g=[1,2]; x=0:1:3", formula=spec.formula)
    assert list(df.columns) == ["x", "g"]
    np.testing.assert_array_equal(df["x"][:4], [0, 1, 2, 3])  # x fastest
    np.testing.assert_array_equal(df["g"][:4], [1, 1, 1, 1])


def test_sample_atdata_drops_incomplete_rows(tmp_path):
    at = tmp_path / "pts.tsv"
    at.write_text("x\n0.0\n\n1.0\n")  # middle row missing
    out = tmp_path / "o.tsv"
    rc = main([
        "--platform", "cpu", "sample", "z :~| SqExp(:x)",
        "--atdata", str(at), "--seed", "0", "--output", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert len(df) == 2 and np.isfinite(df["z"]).all()
