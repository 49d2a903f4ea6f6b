"""cholesky_nocc: the pure-HLO (no custom call) Cholesky used for BATCHED
factorizations on TPU, where XLA's batched-cholesky custom call faults the
axon worker (vmapped low-rank capacitance, multi-chain samplers).  Must match
jnp.linalg.cholesky in values and gradients under batching and vmap."""

import jax
import jax.numpy as jnp
import numpy as np

from gaplac_tpu.ops.cholesky import cholesky_nocc


def _spd(rng, n):
    B = rng.standard_normal((n, n))
    return jnp.asarray(B @ B.T + n * np.eye(n))


def test_values_match_xla_across_sizes():
    rng = np.random.default_rng(0)
    for n in (3, 64, 128, 200, 300, 512):
        A = _spd(rng, n)
        np.testing.assert_allclose(
            np.asarray(cholesky_nocc(A)), np.asarray(jnp.linalg.cholesky(A)),
            rtol=0, atol=1e-11,
        )


def test_batched_and_vmap_match():
    rng = np.random.default_rng(1)
    Ab = jnp.stack([_spd(rng, 48) for _ in range(4)])
    L_ref = np.asarray(jnp.linalg.cholesky(Ab))
    np.testing.assert_allclose(np.asarray(cholesky_nocc(Ab)), L_ref, atol=1e-11)
    L_vmap = np.asarray(jax.vmap(lambda M: cholesky_nocc(M))(Ab))
    np.testing.assert_allclose(L_vmap, L_ref, atol=1e-11)


def test_gradients_match_xla():
    rng = np.random.default_rng(2)
    Ab = jnp.stack([_spd(rng, 40) for _ in range(3)])
    f_ref = lambda A: jnp.sum(jnp.sin(jnp.linalg.cholesky(A)))
    g_ref = np.asarray(jax.grad(f_ref)(Ab))
    g = np.asarray(jax.grad(lambda A: jnp.sum(jnp.sin(cholesky_nocc(A))))(Ab))
    np.testing.assert_allclose(g, g_ref, atol=1e-12)
    # vmapped-grad (the multi-chain sampler pattern)
    gv = np.asarray(
        jax.vmap(jax.grad(lambda M: jnp.sum(jnp.sin(cholesky_nocc(M)))))(Ab)
    )
    np.testing.assert_allclose(gv, g_ref, atol=1e-12)


def test_batchsafe_routing_seam(monkeypatch):
    """linalg.cholesky_batchsafe and the set_batchsafe_default(True) mode
    route through the registered pure-HLO impl on TPU and fall back to
    native elsewhere (simulated by monkeypatching the backend check)."""
    from gaplac_tpu.ops import linalg

    rng = np.random.default_rng(5)
    A = _spd(rng, 16)
    calls = []

    def fake_impl(K):
        calls.append(K.shape)
        return jnp.linalg.cholesky(K)

    monkeypatch.setattr(linalg, "_batchsafe_cholesky", fake_impl)
    # off-TPU (the real CPU test env): native, no routing
    np.testing.assert_allclose(
        np.asarray(linalg.cholesky_batchsafe(A)),
        np.asarray(jnp.linalg.cholesky(A)), atol=1e-12,
    )
    assert not calls
    # "on TPU": batchsafe routes, and cholesky() routes small problems when
    # the default mode is on
    monkeypatch.setattr(linalg, "_on_tpu", lambda: True)
    linalg.cholesky_batchsafe(A)
    assert calls == [(16, 16)]
    try:
        linalg.set_batchsafe_default(True)
        linalg.cholesky(A)
        assert calls == [(16, 16), (16, 16)]
    finally:
        linalg.set_batchsafe_default(False)
    linalg.cholesky(A)  # mode off again: native
    assert len(calls) == 2


def test_no_custom_calls_in_primal_lowering():
    """The whole point: the PRIMAL factorization lowers to pure HLO — no
    custom call (LAPACK / batched-cholesky) at all, including under vmap.
    The pullback may use triangular-solve custom calls (that class is
    stable on the axon worker); it must never use a cholesky one."""
    rng = np.random.default_rng(3)
    Ab = jnp.stack([_spd(rng, 96) for _ in range(2)])
    for fn in (lambda A: cholesky_nocc(A), jax.vmap(lambda M: cholesky_nocc(M))):
        hlo = jax.jit(fn).lower(Ab).as_text()
        assert "custom_call" not in hlo, "custom call leaked into safe primal"
    grad_hlo = jax.jit(jax.grad(lambda A: jnp.sum(cholesky_nocc(A)))).lower(Ab).as_text()
    assert "potrf" not in grad_hlo and "Cholesky" not in grad_hlo
