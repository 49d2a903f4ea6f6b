"""Table IO — TSV/CSV read and the extension-dispatched output rule.

Reference parity: /root/reference/src/utils.jl:30-40 (``_df_output``: '.csv'
-> comma, '.tsv' -> tab, anything else errors; no ``--output`` -> print the
frame) and CSV.read with delimiter sniffing (CLI/src/mcmc.jl:17,
select.jl:16,38 read both true TSVs and the legacy comma-in-.tsv fixtures,
test/testin/mcmc_109.tsv:1).

Hot path: all-numeric tables (mcmc chain files — n_obs+8 float columns per
row) go through the native reader/writer (native/fastio.cpp via
data/fastio.py); mixed-type tables fall back to pandas transparently.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np
import pandas as pd

from gaplac_tpu.data import fastio

log = logging.getLogger("gaplac")


def _sniff_sep(path: str) -> str:
    with open(path, "r") as fh:
        header = fh.readline()
    return "\t" if header.count("\t") >= header.count(",") and "\t" in header else ","


def read_table(path: str) -> pd.DataFrame:
    """Read a delimited table, sniffing ',' vs '\\t' from the header line
    (Julia's CSV.read auto-detects; the legacy chain fixtures are
    comma-delimited despite their .tsv names — SURVEY.md §2.3.2)."""
    path = os.path.expanduser(path)
    sep = _sniff_sep(path)
    native = fastio.read_numeric(path, sep)
    if native is not None:
        names, arr = native
        return pd.DataFrame(arr, columns=names, copy=False)
    return pd.read_csv(path, sep=sep)


def complete_cases(df: pd.DataFrame) -> pd.DataFrame:
    """Drop rows with missing values (ref: completecases filter, select.jl:39)."""
    return df.dropna().reset_index(drop=True)


def df_output(df: pd.DataFrame, output: Optional[str]) -> None:
    """Write by extension, or print when no output path (ref: utils.jl:30-40)."""
    if output is not None:
        log.info("Writing to `%s`", output)
        out = os.path.expanduser(output)
        if out.endswith("csv"):
            sep = ","
        elif out.endswith("tsv"):
            sep = "\t"
        else:
            raise ValueError("--output arg must be '.tsv' or '.csv'")
        if all(pd.api.types.is_numeric_dtype(df[c]) for c in df.columns):
            if fastio.write_numeric(out, sep, [str(c) for c in df.columns],
                                    df.to_numpy(dtype=np.float64)):
                return
        df.to_csv(out, sep=sep, index=False)
    else:
        with pd.option_context("display.max_rows", 20, "display.width", 120):
            print(df)
