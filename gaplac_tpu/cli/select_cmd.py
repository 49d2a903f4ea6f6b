"""`select` command — model comparison via log2 Bayes factors.

Reference parity: /root/reference/CLI/src/select.jl:9-68.

--chains mode: per-model marginal likelihood approximated by the harmonic
mean of per-draw posterior densities over the chain's ``lp`` column.  The
reference computes ``log2(harmmean(BigFloat(2)^lp))`` — i.e. it treats lp as
a base-2 exponent (SURVEY.md §2.3.3); we reproduce that number exactly but in
log-space (log2 HM = log2(n) - log2sumexp(-lp)), no BigFloat needed.  The
chain files may be comma-delimited despite .tsv names (legacy fixtures) and
may name the column lp or lπ — both accepted.

--formulae mode: fixed-hyperparameter ``logpdf(FiniteGP(GP(k), X, 0.1), y)``
for each formula on --data (complete cases only), Bayes = lp1 - lp2.

Positive values favor model 1 (the reference's implemented behavior; its
--formulae help text claims the opposite sign — SURVEY.md §2.3.4 — we follow
the implementation).

``--estimator smc`` replaces the notoriously unstable harmonic mean with a
sequential Monte Carlo marginal-likelihood estimate recomputed from --data
(BASELINE.json north star).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import logsumexp

from gaplac_tpu.cli.common import design_matrix, response_vector
from gaplac_tpu.cli.runtime import default_dtype
from gaplac_tpu.data import complete_cases, load_tables, read_table
from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import mvn

log = logging.getLogger("gaplac")

LP_COLUMNS = ("lp", "lπ")  # current schema + legacy fixture schema


def _read_lp(path: str) -> np.ndarray:
    df = read_table(path)
    for col in LP_COLUMNS:
        if col in df.columns:
            return df[col].to_numpy(dtype=float)
    raise ValueError(
        f"Chain file {path!r} has no log-posterior column "
        f"(looked for {', '.join(LP_COLUMNS)}; found {list(df.columns)})"
    )


def log2_harmonic_mean(lp: np.ndarray) -> float:
    """log2 of harmmean(2^lp), computed in log space (ref: select.jl:17-19)."""
    ln2 = np.log(2.0)
    return float(np.log2(len(lp)) - logsumexp(-lp * ln2) / ln2)


def run(args) -> None:
    log.info("running 'select'")
    log.info("%s", vars(args))

    chains = args.chains
    formulae = args.formulae
    if chains and formulae:
        raise ValueError(
            "'select' can only take one of '--formulae' or '--chains', not both"
        )

    if chains:
        if args.estimator == "smc":
            raise ValueError(
                "--estimator smc works with '--formulae' + '--data' (it "
                "re-estimates the marginal likelihood from the data; chain "
                "files alone are not sufficient)"
            )
        lp1 = log2_harmonic_mean(_read_lp(chains[0]))
        lp2 = log2_harmonic_mean(_read_lp(chains[1]))
        bayes = lp1 - lp2  # == log2(2^lp1 / 2^lp2), select.jl:20
    elif formulae:
        if not args.data:
            raise ValueError("'select --formulae' requires '--data'")
        spec1 = parse_formula(formulae[0])
        spec2 = parse_formula(formulae[1])
        log.debug("GP formulae: %s | %s", spec1.formula, spec2.formula)

        df = complete_cases(load_tables(args.data))
        dtype = default_dtype()

        def fixed_lp(spec):
            ck = compile_formula(spec.formula)
            y = jnp.asarray(response_vector(df, spec), dtype)
            X = jnp.asarray(design_matrix(df, ck), dtype)
            approx = getattr(args, "approx", "none")
            if approx == "auto":
                # resolved PER FORMULA (the two compared formulas may
                # qualify for different paths, e.g. OU vs SqExp*SqExp)
                from gaplac_tpu.inference.routing import choose_approx

                approx = choose_approx(ck, np.asarray(X), "select",
                                       likelihood=spec.likelihood)
            if approx == "rff":
                return _lowrank_fixed_lp(args, ck, X, y)
            if approx == "sde":
                return _markov_fixed_lp(args, ck, X, y)
            K = ck.gram(ck.default_params(dtype), X)
            return float(mvn.mvn_logpdf(K, y, jitter=args.jitter))

        if args.estimator == "smc":
            lp1 = _smc_evidence(args, spec1, df, dtype)
            lp2 = _smc_evidence(args, spec2, df, dtype)
        else:
            lp1, lp2 = fixed_lp(spec1), fixed_lp(spec2)
        bayes = lp1 - lp2  # natural-log lps relabeled log2 (ref parity)
    else:
        raise ValueError(
            "'select' command requires either '--chains' or '--formulae' arguments"
        )

    report = (
        f"**Log2 Bayes**: {round(bayes, 3)}\n\n"
        f"- **Log(pdf)** - model 1: {round(lp1, 4)}\n"
        f"- **Log(pdf)** - model 2: {round(lp2, 4)}\n\n"
        f"_Note_ - Positive values indicate more evidence for model 1"
    )
    log.info("\n%s", report)
    print(report)
    return bayes


def _markov_fixed_lp(args, ck, X, y) -> float:
    """Fixed-hyperparameter logpdf through the exact state-space path
    (--approx sde): parallel-Kalman log N(y; 0, K + (jitter + s2) I) —
    O(n log n), exact (ops/markov.py / ops/markov_ss.py).  Jitted with the
    O(n) arrays as parameters: the eager form dispatches hundreds of
    individually-compiled ops through a remote TPU tunnel (minutes at
    n=2^17); one compiled program runs in milliseconds."""
    from gaplac_tpu.inference.model import (
        _markov_structure, markov_block_xs, markov_param_vals,
    )
    from gaplac_tpu.ops import markov
    from gaplac_tpu.ops import markov_ss as mss

    st = _markov_structure(ck, X)
    p = ck.default_params(X.dtype)
    j_eff = args.jitter + sum(float(p[s]) for s in st.noise_slots)
    idx = jnp.asarray(st.sort_idx)
    ts = jnp.asarray(st.t_sorted, X.dtype)
    ys = jnp.asarray(y)[idx]
    if st.scalar_ou:
        return float(jax.jit(markov.ou_loglik)(
            ts, ys, p[st.blocks[0][1]], j_eff))
    kinds = tuple(b[0] for b in st.blocks)
    resets = tuple(None if r is None else jnp.asarray(r) for r in st.resets)

    @jax.jit
    def lp(ts_, ys_, xs_, p_):
        A, Q, H = mss.build_steps(
            kinds, markov_param_vals(ck, st, p_, X.dtype), ts_, xs_,
            resets=resets, layout="auto",
        )
        return mss.ss_loglik(A, Q, H, ys_, j_eff)

    return float(lp(ts, ys, markov_block_xs(st, X, idx=idx), p))


def _lowrank_fixed_lp(args, ck, X, y) -> float:
    """Fixed-hyperparameter logpdf through the low-rank feature path
    (--approx rff): log N(y; 0, Phi Phi^T + (jitter + bare-noise) I) — the
    O(n m^2) large-n analogue of select.jl:49-50's dense logpdf."""
    from gaplac_tpu.kernels.features import build_feature_map
    from gaplac_tpu.ops import lowrank

    fm = build_feature_map(
        ck, [np.asarray(X)],
        num_features=getattr(args, "rff_features", 256),
        seed=getattr(args, "rff_seed", 0),
    )
    p = ck.default_params(X.dtype)
    phi = fm.phi(p, X)
    d = fm.noise_diag(p, X) + args.jitter
    return float(lowrank.lowrank_logpdf(phi, d, y))


def _smc_evidence(args, spec, df, dtype) -> float:
    """Tempered-SMC log marginal likelihood of one formula, integrating the
    Uniform(0,20) hyperparameter prior (BASELINE.json north star; replaces
    the unstable harmonic mean — SURVEY.md §2.3.3)."""
    import jax as _jax

    from gaplac_tpu.inference.model import build_model
    from gaplac_tpu.inference.smc import smc_log_evidence_gp

    ck = compile_formula(spec.formula)
    y = jnp.asarray(response_vector(df, spec), dtype)
    X = jnp.asarray(design_matrix(df, ck), dtype)
    if args.infer:
        inferable = list(args.infer)
    else:
        # default: the shared lengthscale over all lengthscale-kind leaves
        # (the mcmc command's natural target); fall back to fixed-hyperparam
        # logpdf if the formula has nothing to infer
        from gaplac_tpu.kernels.covariance import LENGTHSCALE_KINDS

        inferable = [
            v for v, k in zip(ck.leaf_vars, ck.kinds)
            if v and k in LENGTHSCALE_KINDS
        ]
    # only apply --infer-extra to formulas that HAVE a shape parameter on
    # that variable (the two compared formulas may differ, e.g. Periodic
    # vs OU on the same column)
    infer_extras = [
        v for v in (getattr(args, "infer_extra", None) or [])
        if any(lv == v and es for lv, es in zip(ck.leaf_vars, ck.extra_slots))
    ]
    if not inferable and not infer_extras:
        K = ck.gram(ck.default_params(dtype), X)
        lp = float(mvn.mvn_logpdf(K, y, jitter=args.jitter))
        log.info("SMC: %s has no inferable hyperparameter; fixed logpdf %.4f",
                 spec.formula, lp)
        return lp
    approx = getattr(args, "approx", "none")
    if approx == "auto":
        from gaplac_tpu.inference.routing import choose_approx

        approx = choose_approx(ck, np.asarray(X), "select",
                               likelihood=spec.likelihood)
    model = build_model(
        ck, inferable, X, y, spec.likelihood, jitter=args.jitter,
        approx=approx if approx in ("rff", "sde") else "exact",
        rff_features=getattr(args, "rff_features", 256),
        rff_seed=getattr(args, "rff_seed", 0),
        infer_extras=infer_extras,
    )
    res = smc_log_evidence_gp(
        _jax.random.key(args.seed), model, n_particles=args.particles
    )
    lp = float(res.log_evidence)
    final_beta = float(res.final_beta)
    if final_beta < 1.0:
        log.warning(
            "SMC for %s stopped at inverse temperature beta=%.4f < 1 "
            "(max stages reached): the reported evidence is for a partially "
            "tempered target and will bias the Bayes factor — rerun with "
            "more particles (--particles) for a tighter tempering schedule",
            formulae_str(spec), final_beta,
        )
    log.info(
        "SMC evidence for %s: %.4f (%d stages, %d particles)",
        formulae_str(spec), lp, int(res.n_stages), args.particles,
    )
    return lp


def formulae_str(spec) -> str:
    return f"{spec.response} ~| {spec.formula}"
