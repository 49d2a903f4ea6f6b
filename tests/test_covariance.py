"""Golden tests of the covariance library vs closed forms (SURVEY.md §7.1:
"Golden tests vs closed forms") and of the tensor-product column-select
semantics (SURVEY.md §2.2 — hard part (f))."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaplac_tpu.dsl import parse_kernel_expr
from gaplac_tpu.kernels.covariance import compile_formula


def _gram(expr, X, params=None, X2=None):
    ck = compile_formula(parse_kernel_expr(expr))
    p = ck.default_params() if params is None else jnp.asarray(params, jnp.float64)
    return np.asarray(ck.gram(p, jnp.asarray(X, jnp.float64),
                              None if X2 is None else jnp.asarray(X2, jnp.float64)))


def test_sqexp_closed_form():
    x = np.linspace(-2, 2, 7)[:, None]
    K = _gram("SqExp(:x; l=1.5)", x)
    d = x - x.T
    np.testing.assert_allclose(K, np.exp(-(d**2) / (2 * 1.5**2)), rtol=1e-12)


def test_ou_closed_form():
    x = np.linspace(0, 3, 5)[:, None]
    K = _gram("OU(:t; l=0.7)", x)
    d = np.abs(x - x.T)
    np.testing.assert_allclose(K, np.exp(-d / 0.7), rtol=1e-12)


def test_linear_closed_form():
    x = np.array([-1.0, 0.5, 2.0])[:, None]
    K = _gram("Linear(:x; c=0.3)", x)
    np.testing.assert_allclose(K, x @ x.T + 0.3, rtol=1e-12)


def test_cat_indicator():
    g = np.array([1.0, 2.0, 1.0, 3.0])[:, None]
    K = _gram("Cat(:g)", g)
    expect = (g == g.T).astype(float)
    np.testing.assert_array_equal(K, expect)


def test_noise_bare_is_identity_and_zero_cross():
    X = np.random.default_rng(0).normal(size=(5, 0))
    X = np.zeros((5, 0))
    K = _gram("Noise(s2=0.25)", X)
    np.testing.assert_allclose(K, 0.25 * np.eye(5), rtol=1e-12)
    # cross-gram: white noise never correlates train with test
    Kc = _gram("Noise(s2=0.25)", np.zeros((5, 0)), X2=np.zeros((3, 0)))
    np.testing.assert_array_equal(Kc, np.zeros((5, 3)))


def test_constant():
    X = np.zeros((4, 0))
    K = _gram("Constant(2.5)", X)
    np.testing.assert_allclose(K, np.full((4, 4), 2.5))
    Kc = _gram("Constant(2.5)", np.zeros((4, 0)), X2=np.zeros((2, 0)))
    np.testing.assert_allclose(Kc, np.full((4, 2), 2.5))


def test_tensor_product_column_select():
    # SqExp(:t)*Cat(:g) + Linear(:x): k = SqExp(t,t')*Cat(g,g') + Linear(x,x')
    # (SURVEY.md §2.2 dimension-mapping contract)
    rng = np.random.default_rng(1)
    t = rng.normal(size=6)
    g = rng.integers(0, 2, size=6).astype(float)
    x = rng.normal(size=6)
    X = np.stack([t, g, x], axis=1)
    K = _gram("SqExp(:t) * Cat(:g) + Linear(:x)", X)
    dt = t[:, None] - t[None, :]
    expect = np.exp(-(dt**2) / 2) * (g[:, None] == g[None, :]) + x[:, None] * x[None, :]
    np.testing.assert_allclose(K, expect, rtol=1e-12)


def test_repeated_variable_gets_own_column():
    # Cat(:p)*Cat(:s) + Cat(:p): the second Cat(:p) is a *new* column in the
    # reference's left-to-right scheme (gp_parts.jl:53); callers pass the
    # same data for both columns.
    ck = compile_formula(parse_kernel_expr("Cat(:p) * Cat(:s) + Cat(:p)"))
    assert ck.varnames == ("p", "s", "p")
    assert ck.cols == (0, 1, 2)


def test_param_override_slots():
    ck = compile_formula(parse_kernel_expr("SqExp(:t) * Cat(:g) + Linear(:x)"))
    slots = ck.param_slots_for_vars(["t"])
    assert slots == (0,)
    p = ck.set_params(ck.default_params(), slots, jnp.asarray(3.0))
    np.testing.assert_allclose(np.asarray(p), [3.0, 0.0, 0.0])
    # Cat has no hyperparameter -> inferring only g errors
    with pytest.raises(ValueError):
        ck.param_slots_for_vars(["g"])


def test_gram_diag_matches_gram():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(8, 3))
    ck = compile_formula(parse_kernel_expr("SqExp(:a) * Cat(:b) + Linear(:c) + Noise"))
    p = ck.default_params()
    K = ck.gram(p, jnp.asarray(X))
    d = ck.gram_diag(p, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(jnp.diag(K)), np.asarray(d), rtol=1e-12)


def test_gram_cross_shape_and_consistency():
    rng = np.random.default_rng(3)
    X1 = rng.normal(size=(5, 1))
    X2 = rng.normal(size=(3, 1))
    ck = compile_formula(parse_kernel_expr("SqExp(:x; l=2)"))
    p = ck.default_params()
    K12 = np.asarray(ck.gram(p, jnp.asarray(X1), jnp.asarray(X2)))
    assert K12.shape == (5, 3)
    Kfull = np.asarray(ck.gram(p, jnp.asarray(np.vstack([X1, X2]))))
    np.testing.assert_allclose(K12, Kfull[:5, 5:], rtol=1e-12)


def test_bind_matches_gram():
    """bind(X, dynamic) must equal gram(params, X) (+ diag·I) for any params
    that differ from defaults only at the dynamic slots."""
    import numpy as np

    from gaplac_tpu.dsl.parser import parse_formula

    spec = parse_formula(
        "y :~| Cat(:p) * Cat(:s) + Cat(:p) + Linear(:x) + SqExp(:t; l=2) + OU(:t) + Noise"
    )
    ck = compile_formula(spec.formula)
    rng = np.random.default_rng(0)
    n = 17
    X = jnp.asarray(
        np.column_stack([
            rng.integers(0, 3, n),   # p
            rng.integers(0, 2, n),   # s
            rng.integers(0, 3, n),   # p (repeated)
            rng.uniform(-2, 2, n),   # x
            rng.uniform(0, 5, n),    # t
            rng.uniform(0, 5, n),    # t (repeated)
        ]).astype(float)
    )
    # every non-Cat leaf dynamic
    from gaplac_tpu.kernels.covariance import K_CAT

    dynamic = tuple(i for i, k in enumerate(ck.kinds) if k != K_CAT)
    params = ck.default_params(X.dtype)
    params = params.at[jnp.asarray(dynamic)].set(
        jnp.asarray(rng.uniform(0.5, 3.0, len(dynamic)), X.dtype)
    )
    bound = ck.bind(X, dynamic, diag=0.37)
    K_ref = ck.gram(params, X) + 0.37 * jnp.eye(n, dtype=X.dtype)
    np.testing.assert_allclose(np.asarray(bound(params)), np.asarray(K_ref), rtol=1e-12)


def test_bind_static_subset():
    """Leaves NOT in dynamic_slots are baked at their defaults."""
    import numpy as np

    from gaplac_tpu.dsl.parser import parse_formula

    spec = parse_formula("y :~| SqExp(:t; l=1.5) + Linear(:x; c=0.5)")
    ck = compile_formula(spec.formula)
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.uniform(-1, 1, (9, 2)))
    # only the SqExp lengthscale is dynamic; Linear stays at c=0.5
    dynamic = (0,)
    params = ck.default_params(X.dtype).at[0].set(3.3)
    bound = ck.bind(X, dynamic)
    np.testing.assert_allclose(
        np.asarray(bound(params)), np.asarray(ck.gram(params, X)), rtol=1e-12
    )


def test_extended_kernels_closed_forms():
    """Matern32/52, Periodic, RQ vs closed forms at hand-picked points."""
    import math

    import numpy as np

    from gaplac_tpu.dsl.parser import parse_formula

    x = np.array([0.0, 0.7, 2.3])
    X = jnp.asarray(x[:, None])
    d = abs(x[0] - x[1])

    def k00_01(formula, expect01):
        ck = compile_formula(parse_formula(formula).formula)
        K = np.asarray(ck.gram(ck.default_params(X.dtype), X))
        np.testing.assert_allclose(np.diag(K), 1.0, rtol=1e-12)
        np.testing.assert_allclose(K[0, 1], expect01, rtol=1e-10)
        assert np.allclose(K, K.T)

    l = 1.3
    r3 = math.sqrt(3) * d / l
    k00_01(f"y ~| Matern32(:x; l={l})", (1 + r3) * math.exp(-r3))
    r5 = math.sqrt(5) * d / l
    k00_01(f"y ~| Matern52(:x; l={l})", (1 + r5 + r5 * r5 / 3) * math.exp(-r5))
    p = 2.1
    k00_01(
        f"y ~| Periodic(:x; l={l}, p={p})",
        math.exp(-2 * math.sin(math.pi * d / p) ** 2 / l**2),
    )
    a = 1.7
    k00_01(
        f"y ~| RQ(:x; l={l}, alpha={a})",
        (1 + d * d / (2 * a * l * l)) ** (-a),
    )


def test_extended_kernels_bind_and_infer():
    """bind() and --infer param slots cover the extended kernels."""
    import numpy as np

    from gaplac_tpu.dsl.parser import parse_formula

    spec = parse_formula(
        "y ~| Matern32(:t) + Matern52(:t; l=2) + Periodic(:t; l=1, p=3) + RQ(:t; alpha=1.5)"
    )
    ck = compile_formula(spec.formula)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(0, 5, (11, 4)))
    dynamic = ck.param_slots_for_vars(["t"])
    assert dynamic == (0, 1, 2, 3)  # every extended leaf's l is inferable
    params = ck.default_params(X.dtype).at[jnp.asarray(dynamic)].set(
        jnp.asarray(rng.uniform(0.5, 2.5, 4))
    )
    bound = ck.bind(X, dynamic, diag=0.1)
    K_ref = ck.gram(params, X) + 0.1 * jnp.eye(11, dtype=X.dtype)
    np.testing.assert_allclose(np.asarray(bound(params)), np.asarray(K_ref), rtol=1e-12)
