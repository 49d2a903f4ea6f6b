"""Distributed-path tests on the virtual 8-device CPU mesh (SURVEY.md §4:
"multi-host tests via multi-process CPU simulation ... the standard way to
test pod code without a pod")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaplac_tpu.dsl import parse_formula
from gaplac_tpu.kernels.covariance import compile_formula
from gaplac_tpu.parallel.distributed import (
    data_mesh,
    distributed_cholesky,
    distributed_solve_lower,
    sharded_gram,
)
from gaplac_tpu.parallel.mesh import chain_mesh, shard_chain_axis


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return data_mesh(8)


@pytest.fixture(scope="module")
def composite():
    ck = compile_formula(
        parse_formula("y ~| SqExp(:t) * Cat(:g) + Linear(:x) + Noise").formula
    )
    n = 256
    X = np.random.default_rng(0).normal(size=(n, 3))
    X[:, 1] = np.floor(np.abs(X[:, 1]) * 2)
    return ck, jnp.asarray(X)


def test_sharded_gram_matches_dense(mesh, composite):
    ck, X = composite
    p = ck.default_params()
    K_sharded = sharded_gram(ck, p, X, mesh, jitter=0.1)
    # sharded result must equal the single-device gram (incl. bare-Noise diag)
    K_dense = ck.gram(p, X) + 0.1 * jnp.eye(X.shape[0], dtype=X.dtype)
    np.testing.assert_allclose(np.asarray(K_sharded), np.asarray(K_dense), atol=1e-12)
    # and it must actually be sharded by rows
    shard_shapes = {s.data.shape for s in K_sharded.addressable_shards}
    assert shard_shapes == {(32, 256)}


def test_distributed_cholesky_matches_lapack(mesh, composite):
    ck, X = composite
    p = ck.default_params()
    K = sharded_gram(ck, p, X, mesh, jitter=0.5)
    L = distributed_cholesky(K, mesh)
    Lref = jnp.linalg.cholesky(
        ck.gram(p, X) + 0.5 * jnp.eye(X.shape[0], dtype=X.dtype)
    )
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref), atol=1e-9)
    assert {s.data.shape for s in L.addressable_shards} == {(32, 256)}


def test_distributed_solve(mesh, composite):
    ck, X = composite
    n = X.shape[0]
    p = ck.default_params()
    K = sharded_gram(ck, p, X, mesh, jitter=0.5)
    L = distributed_cholesky(K, mesh)
    b = jnp.asarray(np.random.default_rng(1).normal(size=n))
    x = distributed_solve_lower(L, b, mesh)
    Lref = np.asarray(jnp.linalg.cholesky(ck.gram(p, X) + 0.5 * jnp.eye(n)))
    xref = np.linalg.solve(Lref, np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), xref, atol=1e-8)


def test_distributed_mvn_logpdf_end_to_end(mesh, composite):
    # full large-n pipeline: sharded gram -> distributed chol -> solve -> lp
    ck, X = composite
    n = X.shape[0]
    p = ck.default_params()
    y = jnp.asarray(np.random.default_rng(2).normal(size=n))

    K = sharded_gram(ck, p, X, mesh, jitter=1.1)
    L = distributed_cholesky(K, mesh)
    alpha = distributed_solve_lower(L, y, mesh)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    lp = -0.5 * (alpha @ alpha + logdet + n * np.log(2 * np.pi))

    from gaplac_tpu.ops import mvn

    lp_ref = mvn.mvn_logpdf(ck.gram(p, X), y, jitter=1.1)
    np.testing.assert_allclose(float(lp), float(lp_ref), rtol=1e-10)


def test_chain_sharding_vmap_nuts(mesh):
    # 8 chains sharded over 8 devices run a real sampler step identically
    # to unsharded execution
    from gaplac_tpu.inference.nuts import run_nuts

    cov = np.diag([2.0, 0.5])
    prec = jnp.asarray(np.linalg.inv(cov))
    ld = lambda q: -0.5 * q @ prec @ q

    keys = jax.random.split(jax.random.key(0), 8)
    q0s = jnp.zeros((8, 2))
    run = jax.jit(jax.vmap(lambda k, q: run_nuts(k, ld, q, 100, num_warmup=100)))
    keys_s, q0s_s = shard_chain_axis(keys, q0s, mesh=chain_mesh(8))
    res_sharded = run(keys_s, q0s_s)
    res_plain = run(keys, q0s)
    # sharded compilation reorders fp ops and NUTS trajectories are chaotic;
    # compare the posteriors statistically, not bitwise
    qs_s = np.asarray(res_sharded.positions).reshape(-1, 2)
    qs_p = np.asarray(res_plain.positions).reshape(-1, 2)
    assert {s.data.shape for s in res_sharded.positions.addressable_shards} == {(1, 100, 2)}
    np.testing.assert_allclose(qs_s.mean(0), qs_p.mean(0), atol=0.3)
    np.testing.assert_allclose(qs_s.std(0), qs_p.std(0), rtol=0.3)


def test_smc_with_sharded_particles():
    # the SMC kernel's reductions compile under a sharded particle axis
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gaplac_tpu.inference.smc import run_smc

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0.5, 1.0, size=10))
    logprior = lambda u: -0.5 * jnp.sum(u**2)
    loglik = lambda u: jnp.sum(-0.5 * (y - u[0]) ** 2)

    mesh = chain_mesh(8)
    sharding = NamedSharding(mesh, P("chains"))

    def sample_prior(k, n):
        return jax.device_put(jax.random.normal(k, (n, 1)), sharding)

    res = jax.jit(
        lambda k: run_smc(k, sample_prior, logprior, loglik, n_particles=512)
    )(jax.random.key(1))
    assert np.isfinite(float(res.log_evidence))
    assert float(res.final_beta) == 1.0


def test_sharded_lowrank_logpdf_matches_single_device(mesh):
    """Row-sharded feature-space marginal == single-device Woodbury logpdf,
    value AND gradient (the multi-chip --approx rff logdensity)."""
    from gaplac_tpu.kernels.features import build_feature_map
    from gaplac_tpu.ops import lowrank
    from gaplac_tpu.parallel.distributed import sharded_lowrank_logpdf

    ck = compile_formula(
        parse_formula("y ~| SqExp(:x) + Cat(:g) + Noise(s2=0.3)").formula
    )
    n = 256
    rng = np.random.default_rng(3)
    X = np.stack([rng.uniform(-4, 4, n), rng.integers(0, 3, n).astype(float)], axis=1)
    Xj = jnp.asarray(X)
    y = jnp.asarray(rng.standard_normal(n))
    fm = build_feature_map(ck, [X], num_features=64, seed=0)
    extra = 1.1  # jitter + sigma2

    def lp_single(params):
        phi = fm.phi(params, Xj)
        return lowrank.lowrank_logpdf(phi, extra + fm.noise_diag(params, Xj), y)

    def lp_sharded(params):
        return sharded_lowrank_logpdf(fm, params, Xj, extra, y, mesh)

    params = ck.default_params(Xj.dtype)
    np.testing.assert_allclose(
        float(lp_sharded(params)), float(lp_single(params)), rtol=1e-10
    )
    g_single = jax.grad(lp_single)(params)
    g_sharded = jax.grad(lp_sharded)(params)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_single), rtol=1e-8, atol=1e-12
    )
    # and under jit (the sampler's usage)
    np.testing.assert_allclose(
        float(jax.jit(lp_sharded)(params)), float(lp_single(params)), rtol=1e-10
    )


def test_chain_sharded_sde_model(mesh):
    """The exact state-space (--approx sde) marginal under a sharded chain
    axis: vmapped ChEES steps on a grouped Markov×Cat model compile and run
    with the chain batch sharded over 8 devices, and the sharded logdensity
    values equal the unsharded ones exactly (the scan is chain-local)."""
    from gaplac_tpu.inference.chees import run_chees
    from gaplac_tpu.inference.model import build_model

    rng = np.random.default_rng(44)
    n = 64
    g = rng.integers(0, 4, n).astype(float)
    t = rng.uniform(0, 10, n)
    spec = parse_formula("y ~| OU(:t)*Cat(:g) + Cat(:g) + Noise")
    ck = compile_formula(spec.formula)
    X = jnp.asarray(np.stack([t, g, g], 1))
    y = jnp.asarray(np.sin(t) + rng.normal(0, 0.5, n))
    m = build_model(ck, ["t"], X, y, spec.likelihood, approx="sde")

    us = jax.vmap(m.initial_position)(jax.random.split(jax.random.key(0), 8))
    us_s = shard_chain_axis(us, mesh=chain_mesh(8))
    lds = jax.jit(jax.vmap(m.logdensity))
    np.testing.assert_allclose(np.asarray(lds(us_s)), np.asarray(lds(us)),
                               rtol=1e-12)

    res = jax.jit(
        lambda k: run_chees(k, m.logdensity, us_s, 3, num_warmup=3,
                            max_leapfrogs=32)
    )(jax.random.key(1))
    assert np.isfinite(np.asarray(res.positions)).all()


def test_chain_sharded_whitened_sde_model(mesh):
    """The innovation-whitened joint model (--approx sde --no-marginalize,
    dim nh+n) under a sharded chain axis: the chol-free whitening scans are
    chain-local, so sharded logdensity equals unsharded exactly and a
    data-as-arguments ChEES step runs sharded (the >8-chain crash-free
    route on the axon worker — no cholesky custom call anywhere)."""
    from gaplac_tpu.inference.chees import run_chees
    from gaplac_tpu.inference.model import build_model

    rng = np.random.default_rng(45)
    n = 48
    x = np.sort(rng.uniform(0, 10, n))
    X = jnp.asarray(x[:, None])
    y = jnp.asarray(np.sin(x) + rng.normal(0, 0.5, n))
    spec = parse_formula("y ~| SqExp(:x)")
    ck = compile_formula(spec.formula)
    m = build_model(ck, ["x"], X, y, spec.likelihood, approx="sde",
                    marginalize=False)

    us = jax.vmap(m.initial_position)(jax.random.split(jax.random.key(0), 8))
    us_s = shard_chain_axis(us, mesh=chain_mesh(8))
    lds = jax.jit(jax.vmap(m.logdensity))
    np.testing.assert_allclose(np.asarray(lds(us_s)), np.asarray(lds(us)),
                               rtol=1e-12)

    res = jax.jit(
        lambda k, d: run_chees(k, lambda u: m.logdensity_data(u, d), us_s, 3,
                               num_warmup=3, max_leapfrogs=32)
    )(jax.random.key(1), m.data)
    assert np.isfinite(np.asarray(res.positions)).all()
