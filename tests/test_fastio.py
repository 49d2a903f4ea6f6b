"""Native numeric-table IO tests: roundtrip vs pandas, mixed-table fallback,
malformed input, and a throughput sanity check."""

import time

import numpy as np
import pandas as pd
import pytest

from gaplac_tpu.data import fastio
from gaplac_tpu.data.io import df_output, read_table


@pytest.fixture(scope="module")
def have_native():
    if not fastio.available():
        pytest.skip("no C++ toolchain for the native path")
    return True


def test_roundtrip_matches_pandas(have_native, tmp_path):
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "iteration": np.arange(1.0, 51.0),
        "ℓ": rng.uniform(0, 20, 50),
        "fx[1]": rng.normal(size=50),
        "lp": -rng.exponential(100, 50),
    })
    path = tmp_path / "chain.tsv"
    df_output(df, str(path))                       # native writer
    back = read_table(str(path))                   # native reader
    assert list(back.columns) == list(df.columns)  # incl. the unicode ℓ
    np.testing.assert_allclose(back.to_numpy(), df.to_numpy(), rtol=0, atol=0)
    # and pandas agrees with the native writer's file
    pdf = pd.read_csv(path, sep="\t")
    np.testing.assert_allclose(pdf.to_numpy(), df.to_numpy())


def test_mixed_table_falls_back(tmp_path):
    df = pd.DataFrame({"PersonID": ["a", "b"], "y": [1.0, 2.0]})
    path = tmp_path / "mixed.tsv"
    df.to_csv(path, sep="\t", index=False)
    back = read_table(str(path))
    assert list(back["PersonID"]) == ["a", "b"]


def test_missing_values_roundtrip(have_native, tmp_path):
    path = tmp_path / "m.csv"
    path.write_text("a,b\n1.0,\n,2.5\n")
    back = read_table(str(path))
    assert np.isnan(back["b"][0]) and np.isnan(back["a"][1])
    assert back["a"][0] == 1.0 and back["b"][1] == 2.5


def test_native_read_speed(have_native, tmp_path):
    # chain-shaped table: 400 rows x 508 cols
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(400, 508))
    names = [f"c{i}" for i in range(508)]
    path = tmp_path / "big.tsv"
    assert fastio.write_numeric(str(path), "\t", names, arr)
    t0 = time.time()
    out = fastio.read_numeric(str(path), "\t")
    t_native = time.time() - t0
    assert out is not None
    np.testing.assert_allclose(out[1], arr)
    t0 = time.time()
    pd.read_csv(path, sep="\t")
    t_pandas = time.time() - t0
    # native should not be slower than pandas by more than 2x (typically
    # it is several x faster); this is a sanity gate, not a benchmark
    assert t_native < max(2 * t_pandas, 1.0)


def test_short_row_yields_nan_not_shift(have_native, tmp_path):
    # regression: a short row must NOT consume the next row's first value
    path = tmp_path / "short.csv"
    path.write_text("a,b,c\n1,2\n3,4,5\n")
    out = fastio.read_numeric(str(path), ",")
    assert out is not None
    names, arr = out
    assert arr.shape == (2, 3)
    np.testing.assert_allclose(arr[0][:2], [1.0, 2.0])
    assert np.isnan(arr[0][2])
    np.testing.assert_allclose(arr[1], [3.0, 4.0, 5.0])


def test_quoted_header_unquoted(have_native, tmp_path):
    """R's write.csv quotes header names; the fast path must unquote them
    like the pandas fallback does."""
    p = tmp_path / "r.csv"
    p.write_text('"x","y"\n1.5,2.5\n3.0,4.0\n')
    df = read_table(str(p))
    assert list(df.columns) == ["x", "y"]
    out = fastio.read_numeric(str(p), ",")
    if out is not None:
        assert out[0] == ["x", "y"]


def test_extra_field_row_rejected(have_native, tmp_path):
    """Rows with MORE fields than the header must not be silently truncated
    by the native reader (pandas surfaces the mismatch)."""
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2,99\n")
    assert fastio.read_numeric(str(p), ",") is None


def test_df_output_requires_dot_extension(tmp_path):
    df = pd.DataFrame({"x": [1.0]})
    with pytest.raises(ValueError):
        df_output(df, str(tmp_path / "outputcsv"))  # no '.': must reject
    df_output(df, str(tmp_path / "ok.csv"))
    assert (tmp_path / "ok.csv").read_text().startswith("x")
