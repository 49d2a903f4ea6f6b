"""NUTS calibration on analytic posteriors (SURVEY.md §4: "NUTS on analytic
posteriors (e.g. MVN) for calibration") plus the guide-parity lengthscale
recovery (BASELINE.md correctness gate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.inference.diagnostics import ess, rhat
from gaplac_tpu.inference.model import build_model
from gaplac_tpu.inference.nuts import run_nuts
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.ops import mvn


def test_nuts_mvn_calibration():
    cov = np.array([[2.0, 0.9, 0.0], [0.9, 1.0, 0.3], [0.0, 0.3, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def logdensity(q):
        return -0.5 * q @ prec @ q

    res = jax.jit(
        lambda k: run_nuts(k, logdensity, jnp.zeros(3), 2000, num_warmup=500)
    )(jax.random.key(0))
    qs = np.asarray(res.positions)
    assert res.diverging.sum() == 0
    np.testing.assert_allclose(qs.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.cov(qs.T), cov, atol=0.25)
    # adapted mass should approximate the marginal variances
    np.testing.assert_allclose(np.asarray(res.inv_mass), np.diag(cov), rtol=0.5)
    # dual averaging should land near the 0.65 target
    assert 0.5 < float(res.accept_prob.mean()) < 0.95


def test_nuts_banana_no_nans():
    # mildly pathological target; checks robustness, divergence accounting
    def logdensity(q):
        x, y = q[0], q[1]
        return -0.5 * (x**2 / 4 + (y - x**2 / 2) ** 2)

    res = jax.jit(
        lambda k: run_nuts(k, logdensity, jnp.array([0.1, 0.1]), 4000, num_warmup=1000)
    )(jax.random.key(2))
    qs = np.asarray(res.positions)
    assert np.isfinite(qs).all()
    # marginal of x is N(0, 4); banana curvature mixes slowly, so loose gates
    assert abs(qs[:, 0].mean()) < 1.0
    assert 1.2 < qs[:, 0].std() < 3.0


@pytest.fixture(scope="module")
def guide_data():
    """50 points drawn from SqExp(l=1.5) + jitter 0.1 — the guide's
    data-generating command (README.md:52), typical-amplitude realization."""
    rng = np.random.default_rng(42)
    x = rng.uniform(-5, 5, 50)
    ck = compile_formula(parse_formula("y ~| SqExp(:x; l=1.5)").formula)
    X = jnp.asarray(x[:, None])
    K = ck.gram(ck.default_params(), X)
    y = mvn.sample_mvn(jax.random.key(4), K, jitter=0.1)
    assert 0.9 < float(jnp.std(y)) < 1.2  # typical amplitude
    return X, y


def test_lengthscale_recovery_marginal(guide_data):
    # BASELINE.md gate: posterior ℓ ≈ 1.5 within MC error on guide data.
    X, y = guide_data
    spec = parse_formula("y ~| SqExp(:x)")
    m = build_model(compile_formula(spec.formula), ["x"], X, y, spec.likelihood)
    assert m.marginalized and m.dim == 1
    res = jax.jit(
        lambda k: run_nuts(k, m.logdensity, m.initial_position(jax.random.key(3)), 500, num_warmup=500)
    )(jax.random.key(14))
    ells = np.asarray(jax.vmap(m.constrain)(res.positions)).ravel()
    assert res.diverging.sum() == 0
    # posterior concentrates near the generating value (median more robust
    # than mean under the Uniform(0,20) prior's flat tail)
    assert 1.0 < np.median(ells) < 3.5
    # lp column on the reference's joint-density scale (ref: ~ -81, README.md:88)
    _, f, lp = jax.vmap(m.report)(jax.random.split(jax.random.key(5), 500), res.positions)
    assert -110 < float(np.mean(np.asarray(lp))) < -55
    assert f.shape == (500, 50)


def test_latent_whitened_agrees_with_marginal(guide_data):
    # same posterior over ℓ through the whitened 51-dim path
    X, y = guide_data
    spec = parse_formula("y ~| SqExp(:x)")
    ck = compile_formula(spec.formula)
    m = build_model(ck, ["x"], X, y, spec.likelihood, marginalize=False)
    assert not m.marginalized and m.dim == 51
    res = jax.jit(
        lambda k: run_nuts(k, m.logdensity, m.initial_position(jax.random.key(6)), 400, num_warmup=400)
    )(jax.random.key(7))
    ells = np.asarray(jax.vmap(lambda v: m.constrain(v[:1]))(res.positions)).ravel()
    mm = build_model(ck, ["x"], X, y, spec.likelihood)
    resm = jax.jit(
        lambda k: run_nuts(k, mm.logdensity, mm.initial_position(jax.random.key(3)), 400, num_warmup=400)
    )(jax.random.key(8))
    ellsm = np.asarray(jax.vmap(mm.constrain)(resm.positions)).ravel()
    assert abs(np.median(ells) - np.median(ellsm)) < 1.5


def test_rhat_ess_sane():
    rng = np.random.default_rng(0)
    good = jnp.asarray(rng.normal(size=(4, 500)))
    assert float(rhat(good)) < 1.02
    assert float(ess(good)) > 500
    # deliberately unmixed chains
    bad = jnp.asarray(rng.normal(size=(4, 500)) + np.arange(4)[:, None] * 5)
    assert float(rhat(bad)) > 1.5


def test_chees_mvn_calibration():
    from gaplac_tpu.inference.chees import run_chees

    cov = np.array([[2.0, 0.9, 0.0], [0.9, 1.0, 0.3], [0.0, 0.3, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    ld = lambda q: -0.5 * q @ prec @ q
    q0 = jax.random.normal(jax.random.key(0), (16, 3)) * 0.1
    res = jax.jit(lambda k: run_chees(k, ld, q0, 500, num_warmup=500))(jax.random.key(1))
    qs = np.asarray(res.positions).reshape(-1, 3)
    np.testing.assert_allclose(qs.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.cov(qs.T), cov, atol=0.3)
    assert 0.4 < float(res.accept_prob.mean()) < 0.95


def test_chees_gp_agrees_with_nuts(guide_data):
    from gaplac_tpu.inference.chees import run_chees

    X, y = guide_data
    spec = parse_formula("y ~| SqExp(:x)")
    m = build_model(compile_formula(spec.formula), ["x"], X, y, spec.likelihood,
                    marginalize=False)
    q0 = jax.vmap(m.initial_position)(jax.random.split(jax.random.key(5), 8))
    res = jax.jit(lambda k: run_chees(k, m.logdensity, q0, 300, num_warmup=300))(
        jax.random.key(6)
    )
    ells = np.asarray(
        jax.vmap(jax.vmap(lambda v: m.constrain(v[:1])))(res.positions)
    ).ravel()
    assert 1.0 < np.median(ells) < 4.0  # same posterior region as NUTS


def test_chees_zero_warmup_respects_step_size():
    """num_warmup=0 must sample with the caller's init_step_size and unit
    mass (regression: the DA average exp(0)=1 and an empty Welford mass were
    used instead)."""
    from gaplac_tpu.inference.chees import run_chees

    ld = lambda q: -0.5 * jnp.sum(q * q)
    q0 = jax.random.normal(jax.random.key(0), (4, 3))
    res = jax.jit(
        lambda k: run_chees(k, ld, q0, 10, num_warmup=0, init_step_size=0.05)
    )(jax.random.key(1))
    assert np.isclose(float(res.step_size), 0.05)
    np.testing.assert_allclose(np.asarray(res.inv_mass), 1.0)
    assert np.isfinite(np.asarray(res.positions)).all()


def test_interval_lp_finite_at_bounds():
    """Draws recorded exactly at the prior bounds (f32 sigmoid saturation)
    must not produce -inf in the lp column."""
    from gaplac_tpu.inference.transforms import Interval

    tr = Interval(0.0, 20.0)
    lp = np.asarray(tr.constrained_logprior(jnp.asarray([0.0, 10.0, 20.0])))
    assert np.isfinite(lp).all()
    assert not np.isfinite(float(tr.constrained_logprior(jnp.asarray(20.0001))))


def test_hmc_mvn_calibration():
    """run_hmc (fixed-trajectory static-scan sampler) recovers a correlated
    MVN's moments — same oracle as the ChEES calibration test."""
    from gaplac_tpu.inference.chees import run_hmc

    cov = np.array([[2.0, 0.9, 0.0], [0.9, 1.0, 0.3], [0.0, 0.3, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    ld = lambda q: -0.5 * q @ prec @ q
    q0 = jax.random.normal(jax.random.key(0), (16, 3)) * 0.1
    res = jax.jit(
        lambda k: run_hmc(k, ld, q0, 500, num_warmup=500, num_leapfrogs=16)
    )(jax.random.key(1))
    qs = np.asarray(res.positions).reshape(-1, 3)
    np.testing.assert_allclose(qs.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.cov(qs.T), cov, atol=0.3)
    assert 0.4 < float(res.accept_prob.mean()) < 0.99


def test_hmc_zero_warmup_respects_step_size():
    from gaplac_tpu.inference.chees import run_hmc

    ld = lambda q: -0.5 * jnp.sum(q * q)
    q0 = jax.random.normal(jax.random.key(0), (4, 3))
    res = jax.jit(
        lambda k: run_hmc(k, ld, q0, 10, num_warmup=0, init_step_size=0.05,
                          num_leapfrogs=4)
    )(jax.random.key(1))
    assert np.isclose(float(res.step_size), 0.05)
    np.testing.assert_allclose(np.asarray(res.inv_mass), 1.0)
    assert np.isfinite(np.asarray(res.positions)).all()


def test_hmc_segmented_matches_monolithic():
    """The segmented host-driven driver threads the COMPLETE HmcCarry
    through every jitted segment, so for a fixed seed it reproduces the
    monolithic run_hmc stream (warmup adaptation included) regardless of
    segment size — the correctness contract that lets the large-n path
    claim run_hmc's semantics."""
    from gaplac_tpu.inference.chees import run_hmc
    from gaplac_tpu.inference.segmented import run_hmc_segmented

    cov = np.array([[2.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    ld = lambda q: -0.5 * q @ prec @ q
    q0 = jax.random.normal(jax.random.key(3), (4, 2)) * 0.3
    kwargs = dict(num_warmup=21, num_leapfrogs=8, init_step_size=0.2)
    ref = jax.jit(
        lambda k: run_hmc(k, ld, q0, 30, **kwargs)
    )(jax.random.key(4))
    for seg in (5, 13, 64):
        res = run_hmc_segmented(jax.random.key(4), ld, q0, 30,
                                segment_size=seg, **kwargs)
        np.testing.assert_allclose(res.positions, np.asarray(ref.positions),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(res.logps, np.asarray(ref.logps),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(res.accept_prob,
                                   np.asarray(ref.accept_prob),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(res.step_size, float(ref.step_size),
                                   rtol=1e-7)
        np.testing.assert_allclose(res.inv_mass, np.asarray(ref.inv_mass),
                                   rtol=1e-7)


def test_hmc_segmented_data_form_and_checkpoint_cb():
    """Segmented driver with the data-as-jit-parameter target (the large-n
    form) + per-segment checkpoint callback."""
    from gaplac_tpu.inference.segmented import run_hmc_segmented

    prec = jnp.asarray([[1.0, 0.3], [0.3, 2.0]])

    def ld_data(q, d):
        return -0.5 * q @ d["prec"] @ q

    q0 = jax.random.normal(jax.random.key(5), (3, 2)) * 0.3
    states = []
    res = run_hmc_segmented(
        jax.random.key(6), None, q0, 12, num_warmup=8, num_leapfrogs=4,
        segment_size=5, data={"prec": prec}, logdensity_data=ld_data,
        checkpoint_cb=states.append,
    )
    assert res.positions.shape == (3, 12, 2)
    assert np.isfinite(res.positions).all()
    # ceil(12/5) = 3 sampling segments -> 3 checkpoint states
    assert len(states) == 3
    assert states[-1]["positions"].shape == (3, 2)
    assert np.isfinite(states[-1]["step_size"])
    assert states[-1]["inv_mass"].shape == (2,)
