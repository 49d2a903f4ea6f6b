"""`sample` command — draw from the GP prior on a Cartesian grid.

Reference parity: /root/reference/CLI/src/sample.jl:7-44 — parse spec, build
kernel, eval --at ranges, Cartesian grid, ``rand(gp(RowVecs(X), 0.1))``,
append response column, table output, optional 1-variable plot (warn for
multivariable formulas).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from gaplac_tpu.cli.runtime import default_dtype
from gaplac_tpu.data import df_output, make_test_df
from gaplac_tpu.dsl import parse_at_ranges, parse_formula
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import mvn

log = logging.getLogger("gaplac")


def run(args) -> None:
    log.info("running 'sample'")
    log.info("%s", vars(args))
    spec = parse_formula(args.spec)
    log.debug("GP spec: %s", spec.formula)

    ck = compile_formula(spec.formula)
    log.debug("Model variables: %s", ck.varnames)

    at = parse_at_ranges(args.at, formula=spec.formula, seed=args.seed)
    log.debug("Inferred ranges: %s", {k: len(v) for k, v in at.items()})

    # grid over UNIQUE variables (a repeated var like SqExp(:x)*OU(:x) reads
    # the same column twice — it must not become two independent grid axes)
    unique_vars = list(dict.fromkeys(ck.varnames))
    df = make_test_df(at, unique_vars)
    dtype = default_dtype()
    X = jnp.asarray(
        np.stack([df[v].to_numpy(dtype=float) for v in ck.varnames], axis=1)
        if ck.varnames else np.zeros((len(df), 0)),
        dtype,
    )

    seed = args.seed if args.seed is not None else int(np.random.SeedSequence().entropy % (2**63))
    key = jax.random.key(seed)
    params = ck.default_params(dtype)
    K = ck.gram(params, X)
    y = mvn.sample_mvn(key, K, jitter=mvn.DEFAULT_JITTER)  # ref: rand(gp(X, 0.1))
    df[spec.response] = np.asarray(y)

    df_output(df, args.output)

    if args.plot:
        if len(ck.varnames) > 1:
            log.warning(
                "Auto-generated sample plots not available for multivariable models, "
                "use `--output` to make a table and plot manually"
            )
        else:
            log.info("Plotting output")
            from gaplac_tpu.viz.plots import sample_plot

            fig = sample_plot(
                ck, df[ck.varnames[0]].values, df[spec.response].values,
                xlabel=ck.varnames[0], ylabel=spec.response,
            )
            fig.savefig(args.plot, dpi=120)
            log.info("Saved plot to %s", args.plot)
