"""gaplac CLI — argument schema and dispatch.

Reference parity: /root/reference/CLI/src/main.jl:1-106 (ArgParse tables) and
bin/main.jl:1-21 (flag -> log level -> dispatch).  Same five subcommands
(sample / mcmc / select / predict / fitplot — the last two are implemented
here; the reference registers but never dispatches them, SURVEY.md §2.3.8),
same flags and defaults, plus TPU-scale extensions (--chains, --warmup,
--seed, --platform, --precision, --checkpoint/--resume, --estimator).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gaplac",
        description="TPU-native Gaussian-Process inference for longitudinal analysis "
        "of compositional data (GaPLAC-compatible formula DSL).",
        epilog="Kernels: SqExp(:x; l) | OU(:x; l) | Linear(:x; c) | Cat(:x) | "
        "Noise | Constant | 1(c) | Matern32(:x; l) | Matern52(:x; l) | "
        "Periodic(:x; l, p) | RQ(:x; l, alpha).  The lengthscale-class "
        "hyperparameter l (and Linear's c, Noise's s2) is chain-sampled via "
        "--infer; Periodic's period p and RQ's alpha are shape parameters, "
        "static at the formula's value unless listed in --infer-extra.",
    )
    # global flags (ref: CLI/src/main.jl:21-31)
    p.add_argument("-v", "--verbose", action="store_true", help="Log level to info")
    p.add_argument("-q", "--quiet", action="store_true", help="Log level to error")
    p.add_argument("--debug", action="store_true", help="Log level to debug")
    p.add_argument("--log", help="Log to a file as well as stderr")
    p.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                   help="Force JAX platform (default: auto)")
    p.add_argument("--precision", choices=["f32", "f64"], default=None,
                   help="Compute precision (default: f64 on CPU, f32 on TPU)")
    p.add_argument("--profile", action="store_true",
                   help="Print a phase wall-clock breakdown")
    p.add_argument("--profile-dir", default=None, metavar="DIR",
                   help="Also write a jax.profiler trace to DIR (TensorBoard)")

    sub = p.add_subparsers(dest="command", metavar="{sample,mcmc,select,predict,fitplot}")

    # -- sample (ref: CLI/src/main.jl:34-46) -------------------------------
    ps = sub.add_parser("sample", help="Sample from the GP prior at given inputs")
    ps.add_argument("spec", help="GP formula specification, e.g. \"y :~| SqExp(:x; l=1)\"")
    ps.add_argument("--at", help="Range to sample at, eg 'x=-5:0.1:5' "
                    "(grouped 'var/group=...' supported)")
    ps.add_argument("--atdata", help="Table of points to sample at (alternative to --at)")
    ps.add_argument("-i", "--data",
                    help="Training data — when given, sample the POSTERIOR GP "
                    "conditioned on it (legacy sample contract, bin/old_options.jl:93-118)")
    ps.add_argument("-m", "--mcmc",
                    help="MCMC chain of hyperparameter draws (with --data); "
                    "one chain row is drawn per sample")
    ps.add_argument("--infer", nargs="+", default=None,
                    help="Variables the --mcmc chain inferred (as in the mcmc run)")
    ps.add_argument("--infer-mode", choices=["shared", "pervar"], default="shared")
    ps.add_argument("--infer-extra", nargs="+", default=None, metavar="VAR",
                    help="Variables whose shape parameters (Periodic period, "
                    "RQ alpha) the --mcmc chain inferred (match the mcmc run)")
    ps.add_argument("--plot", help="File to plot to")
    ps.add_argument("--plotx", help="Plot x axis: 'x' or 'x:group' (legacy --plotx)")
    ps.add_argument("-o", "--output", help="Table output - '.csv', '.tsv', or 'stdout'")
    ps.add_argument("--seed", type=int, default=None, help="PRNG seed")
    ps.add_argument("--jitter", type=float, default=0.1, help="Latent GP noise floor")
    ps.add_argument("--approx", choices=["none", "rff", "sde", "auto"], default="none",
                    help="auto: route by the measured cost model (dense at small n, sde for state-space formulas at large n, rff otherwise). rff: prior/posterior draws through the low-rank "
                    "feature path (O(n m) Matheron — the large-n mode). "
                    "sde: exact state-space prior/posterior draws for "
                    "OU/Matern/Constant/Linear (+Cat groups, + Noise) "
                    "formulas — O(n log n), the million-point mode")
    ps.add_argument("--rff-features", type=int, default=256, metavar="M",
                    help="Features per stationary kernel leaf with --approx rff")
    ps.add_argument("--rff-seed", type=int, default=0)
    _add_sde_flags(ps)
    _add_outlier_flags(ps)

    # -- mcmc (ref: CLI/src/main.jl:48-77) ---------------------------------
    pm = sub.add_parser("mcmc", help="Run MCMC (NUTS) over kernel hyperparameters")
    pm.add_argument("formula", help="GP formula specification")
    pm.add_argument("-i", "--data", required=True, help="Table input for inference")
    pm.add_argument("--infer", nargs="+", default=None,
                    help="Variable names whose kernel hyperparameter to infer "
                    "(this and/or --infer-extra is required)")
    pm.add_argument("--samples", type=int, default=200,
                    help="Number of posterior samples (default 200)")
    pm.add_argument("-o", "--output", help="Table to output sampling chain")
    pm.add_argument("--plot", help="File to plot traces to")
    # TPU-scale extensions
    pm.add_argument("--warmup", type=int, default=None,
                    help="Warmup iterations (default: max(samples, 200))")
    pm.add_argument("--chains", type=int, default=1, help="Number of chains (sharded over devices)")
    pm.add_argument("--seed", type=int, default=0, help="PRNG seed")
    pm.add_argument("--target-accept", type=float, default=0.65)
    pm.add_argument("--max-depth", type=int, default=10)
    pm.add_argument("--no-marginalize", action="store_true",
                    help="Sample latents jointly (reference formulation) even for Gaussian likelihoods")
    pm.add_argument("--sampler", choices=["nuts", "chees", "hmc", "advi"],
                    default="nuts",
                    help="nuts (default), chees (cross-chain adaptive HMC — the "
                    "TPU-native high-throughput path; wants --chains >= 8), "
                    "hmc (fixed-trajectory jittered HMC: pure static-scan "
                    "control flow — the crash-safe sampler for backends that "
                    "fault on while_loop programs; see --leapfrogs), or "
                    "advi (variational fast path)")
    pm.add_argument("--leapfrogs", type=int, default=32,
                    help="Leapfrog steps per --sampler hmc trajectory "
                    "(static; default 32)")
    pm.add_argument("--segments", type=int, default=None, metavar="S",
                    help="With --sampler hmc: drive sampling from the host "
                    "in jitted segments of S transitions instead of one "
                    "monolithic program — the large-n mode (compiled "
                    "program stays at value+grad scale; a checkpoint is "
                    "written after every sampling segment). Default: auto "
                    "(on, S=25, when n >= 2^18 — the measured backend "
                    "program-size fault boundary); 0 forces monolithic")
    pm.add_argument("--infer-mode", choices=["shared", "pervar"], default="shared",
                    help="shared (reference parity: ONE scalar for all --infer vars) "
                    "or pervar (one hyperparameter per distinct variable)")
    pm.add_argument("--infer-extra", nargs="+", default=None, metavar="VAR",
                    help="Also infer the shape parameters (Periodic's period p, "
                    "RQ's alpha) of kernels on these variables — one extra θ "
                    "column each, same --prior (not available with --approx rff)")
    pm.add_argument("--progress", action="store_true",
                    help="Emit in-run progress lines from the compiled sampler "
                    "(ref: Turing progress=true; off by default — each tick is "
                    "a host callback, which can stall a remote TPU tunnel)")
    pm.add_argument("--check-numerics", action="store_true",
                    help="Enable jax NaN/Inf debugging (jax_debug_nans)")
    pm.add_argument("--approx", choices=["none", "laplace", "rff", "sde", "auto"],
                    default="none",
                    help="auto: route by the measured cost model (dense at small n, sde for state-space formulas at large n, rff/laplace otherwise). laplace: integrate non-Gaussian latents out with a "
                    "Laplace approximation (fast path; legacy laplace_approx). "
                    "rff: low-rank feature-space marginal (random Fourier + "
                    "exact features; O(n m^2) — the large-n path). "
                    "sde: EXACT state-space marginal for OU (+ Noise) formulas "
                    "via parallel Kalman filtering — O(n log n), the "
                    "time-series path for very large n")
    pm.add_argument("--rff-features", type=int, default=256, metavar="M",
                    help="Features per stationary kernel leaf with --approx rff")
    pm.add_argument("--rff-seed", type=int, default=0,
                    help="Feature-frequency PRNG seed with --approx rff")
    pm.add_argument("--no-latents", action="store_true",
                    help="Omit the fx[i] latent columns from the chain table "
                    "(keeps lp; essential at large n where n columns are "
                    "impractical)")
    pm.add_argument("--vi-steps", type=int, default=2000,
                    help="ADVI optimization steps (with --sampler advi)")
    pm.add_argument("--burnin", type=int, default=0,
                    help="Additional draws to discard post-warmup (legacy --burnin)")
    pm.add_argument("--thin", type=int, default=1, help="Keep every k-th draw (legacy --thin)")
    pm.add_argument("--prior", default="Uniform(0,20)",
                    help="Prior for inferred hyperparameters: Uniform(lo,hi) "
                    "[reference default Uniform(0,20)], LogNormal(mu,sigma), "
                    "Gamma(alpha,rate), TruncatedNormal(mu,sigma,lo,hi)")
    pm.add_argument("--jitter", type=float, default=0.1, help="Latent GP noise floor")
    pm.add_argument("--checkpoint", help="Path to write sampler-state checkpoints")
    pm.add_argument("--resume", help="Resume/extend from a checkpoint or previous chain output")
    _add_sde_flags(pm)
    _add_outlier_flags(pm)

    # -- select (ref: CLI/src/main.jl:79-105) ------------------------------
    pl = sub.add_parser("select", help="Model selection (log2 Bayes factors)")
    pl.add_argument("--formulae", nargs=2, metavar=("F1", "F2"),
                    help="Compare 2 formulas on --data at fixed hyperparameters")
    pl.add_argument("--chains", nargs=2, metavar=("C1", "C2"),
                    help="Compare 2 mcmc chain outputs (marginal-likelihood estimate)")
    pl.add_argument("-i", "--data", help="Table input (required with --formulae)")
    pl.add_argument("--plot", help="File to plot to")
    pl.add_argument("--estimator", choices=["harmonic", "smc"], default="harmonic",
                    help="harmonic (--chains; reference parity) or smc: a tempered-SMC "
                    "marginal likelihood over the hyperparameter prior (--formulae mode)")
    pl.add_argument("--infer", nargs="+", default=None,
                    help="With --estimator smc: variables whose hyperparameter to "
                    "integrate over (default: all lengthscale-kind leaves)")
    pl.add_argument("--infer-extra", nargs="+", default=None, metavar="VAR",
                    help="With --estimator smc: also integrate over the shape "
                    "parameters (Periodic period, RQ alpha) of kernels on these "
                    "variables, where the formula has them")
    pl.add_argument("--particles", type=int, default=512, help="SMC particle count")
    pl.add_argument("--approx", choices=["none", "rff", "sde", "auto"], default="none",
                    help="auto: route by the measured cost model (dense at small n, sde for state-space formulas at large n, rff otherwise). rff: evaluate --formulae logpdfs (and the SMC target) "
                    "through the low-rank feature path — the large-n mode. "
                    "sde: exact O(n log n) state-space path for OU (+ Noise) "
                    "formulas (both formulas must qualify)")
    pl.add_argument("--rff-features", type=int, default=256, metavar="M",
                    help="Features per stationary kernel leaf with --approx rff")
    pl.add_argument("--rff-seed", type=int, default=0)
    pl.add_argument("--seed", type=int, default=0)
    pl.add_argument("--jitter", type=float, default=0.1)
    _add_sde_flags(pl)

    # -- predict (registered-but-unimplemented in ref; legacy contract
    #    bin/old_options.jl:62-87, test/pred.jl:6-14) -----------------------
    pp = sub.add_parser("predict", help="Posterior predictions at --at/--atdata points")
    pp.add_argument("formula", help="GP formula specification")
    pp.add_argument("-i", "--data", required=True, help="Training data table")
    pp.add_argument("-m", "--mcmc", help="MCMC chain table (hyperparameter draws); "
                    "defaults to the formula's fixed hyperparameters")
    pp.add_argument("--infer", nargs="+", default=None,
                    help="Variables whose hyperparameter the chain inferred "
                    "(same as the mcmc run that produced --mcmc)")
    pp.add_argument("--infer-mode", choices=["shared", "pervar"], default="shared",
                    help="Match the mcmc run's --infer-mode")
    pp.add_argument("--infer-extra", nargs="+", default=None, metavar="VAR",
                    help="Match the mcmc run's --infer-extra")
    pp.add_argument("--at", help="Points to predict at, e.g. 'x=-5:0.1:5;g=0'")
    pp.add_argument("--atdata", help="Table of points to predict at (alternative to --at)")
    pp.add_argument("-o", "--output", help="Output table (.csv/.tsv)")
    pp.add_argument("--plot", help="File to plot to")
    pp.add_argument("--seed", type=int, default=0)
    pp.add_argument("--jitter", type=float, default=0.1)
    pp.add_argument("--approx", choices=["none", "rff", "sde", "auto"], default="none",
                    help="auto: route by the measured cost model (dense at small n, sde for state-space formulas at large n, rff otherwise). rff: weight-space predictive equations through the "
                    "low-rank feature path (O(n m^2) — the large-n mode). "
                    "sde: exact state-space smoother for OU (+ Noise) formulas "
                    "(O((n+nt) log) — the time-series mode)")
    pp.add_argument("--rff-features", type=int, default=256, metavar="M",
                    help="Features per stationary kernel leaf with --approx rff")
    pp.add_argument("--rff-seed", type=int, default=0)
    pp.add_argument("--sde-window", type=int, default=None, metavar="W",
                    help="With --approx sde: smooth in overlapping windows "
                    "of W rows (one traced window body — compile cost "
                    "independent of n; the high-state-dim large-n mode). "
                    "Default: auto (2^14 when state dim > 24 and joined "
                    "n > 2^15); 0 forces monolithic")
    pp.add_argument("--sde-overlap", type=int, default=None, metavar="V",
                    help="Context rows on each side of a --sde-window "
                    "(default W//8; must span a few lengthscales)")
    _add_sde_flags(pp)
    _add_outlier_flags(pp)

    # -- fitplot (registered-but-unimplemented in ref; legacy contract
    #    bin/old_options.jl:119-142) ---------------------------------------
    pf = sub.add_parser("fitplot", help="Per-component posterior diagnostic plots")
    pf.add_argument("formula", help="GP formula specification")
    pf.add_argument("-i", "--data", required=True, help="Training data table")
    pf.add_argument("-m", "--mcmc", help="MCMC chain table (optional)")
    pf.add_argument("--infer", nargs="+",
                    help="Variables the chain's hyperparameters were inferred "
                         "for (must match the mcmc run; default: one shared "
                         "lengthscale over all lengthscale-kind leaves)")
    pf.add_argument("--infer-mode", choices=["shared", "pervar"], default="shared",
                    help="Hyperparameter grouping used by the mcmc run")
    pf.add_argument("--infer-extra", nargs="+", default=None, metavar="VAR",
                    help="Match the mcmc run's --infer-extra")
    pf.add_argument("--component", "--comp", dest="component",
                    help="Only plot components involving these ;-separated variables")
    pf.add_argument("-o", "--output", default="fitplots.png", help="Output image file")
    pf.add_argument("--seed", type=int, default=0)
    pf.add_argument("--jitter", type=float, default=0.1)
    pf.add_argument("--approx", choices=["none", "rff", "sde", "auto"], default="none",
                    help="auto: route by the measured cost model (dense at small n, sde for state-space formulas at large n, rff otherwise). rff: per-component decomposition through the "
                    "low-rank feature path (the large-n mode). "
                    "sde: per-component posteriors by masking the state-space "
                    "measurement row to one block — O(n log n), exact for "
                    "OU/Matern/Constant/Linear (+Cat groups, + Noise)")
    pf.add_argument("--rff-features", type=int, default=256, metavar="M",
                    help="Features per stationary kernel leaf with --approx rff")
    pf.add_argument("--rff-seed", type=int, default=0)
    _add_sde_flags(pf)
    _add_outlier_flags(pf)

    return p


def _add_sde_flags(sub) -> None:
    """--approx sde tuning knobs (static state-space structure)."""
    sub.add_argument("--sde-harmonics", type=int, default=None, metavar="J",
                     help="Periodic block harmonics under --approx sde "
                     "(state dim 2J+1; default 10). J=5 is accuracy-free "
                     "for l >= 0.7 and makes quasi-periodic PRODUCT "
                     "sampling ~7x cheaper (d^3-bound gradients)")
    sub.add_argument("--sde-rq-nodes", type=int, default=None, metavar="K",
                     help="RQ block Gamma-mixture nodes under --approx sde "
                     "(state dim 6K; default 8)")
    sub.add_argument("--sde-soa-max-d", type=int, default=None, metavar="D",
                     help="max total state dim routed through the "
                     "struct-of-arrays scan layout under --approx sde "
                     "(no TPU tile padding; default 4, 0 disables). Every "
                     "block kind has a SoA emitter; the combine traces "
                     "O(d^3) vector ops, so ~8 is the sane ceiling")


def _add_outlier_flags(sub) -> None:
    """Legacy outlier-removal flags (bin/old_options.jl:32-41)."""
    sub.add_argument("--rmv-outliers", "--rmv_outliers", dest="rmv_outliers",
                     choices=["none", "fence"], default="none",
                     help="Outlier removal method for training data (none|fence)")
    sub.add_argument("--outlier-fields", "--outlier_fields", dest="outlier_fields",
                     default="", help=";-separated additional fields to fence")
    sub.add_argument("--outlier-ignore", "--outlier_ignore", dest="outlier_ignore",
                     default="", help=";-separated fields to exclude from fencing")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from gaplac_tpu.cli.logs import setup_logs

    log = setup_logs(args.verbose, args.quiet, args.debug, args.log)
    log.info("Getting started!")

    if args.command is None:
        build_parser().print_help()
        return 1

    from gaplac_tpu.cli.runtime import configure

    configure(args.platform, args.precision)

    # multi-host SPMD when GAPLAC_COORDINATOR is set (pod launches)
    from gaplac_tpu.parallel.multihost import maybe_initialize

    maybe_initialize()

    # sde structure knobs must be set before ANY structure extraction
    if (getattr(args, "sde_harmonics", None)
            or getattr(args, "sde_rq_nodes", None)
            or getattr(args, "sde_soa_max_d", None) is not None):
        from gaplac_tpu.ops import markov_ss

        if getattr(args, "sde_harmonics", None):
            markov_ss.set_periodic_harmonics(args.sde_harmonics)
        if getattr(args, "sde_rq_nodes", None):
            markov_ss.set_rq_nodes(args.sde_rq_nodes)
        if getattr(args, "sde_soa_max_d", None) is not None:
            markov_ss.SOA_MAX_D = max(0, int(args.sde_soa_max_d))

    if args.command == "sample":
        from gaplac_tpu.cli.sample_cmd import run
    elif args.command == "mcmc":
        from gaplac_tpu.cli.mcmc_cmd import run
    elif args.command == "select":
        from gaplac_tpu.cli.select_cmd import run
    elif args.command == "predict":
        from gaplac_tpu.cli.predict_cmd import run
    elif args.command == "fitplot":
        from gaplac_tpu.cli.fitplot_cmd import run
    else:  # pragma: no cover
        raise SystemExit(f"unknown command {args.command}")

    from gaplac_tpu.utils import profiling

    if args.profile or args.profile_dir:
        profiling.enable()
    try:
        with profiling.trace(args.profile_dir):
            with profiling.phase(args.command):
                run(args)
    except (ValueError, FileNotFoundError) as e:
        log.error("%s", e)
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        if args.profile or args.profile_dir:
            profiling.print_report()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
