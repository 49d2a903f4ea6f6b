"""--at range parser tests (ref: interface.jl:89-100 — the reference's own
range testset is broken, SURVEY.md §2.3.5; these implement its intent)."""

import numpy as np
import pytest

from gaplac_tpu.dsl import RangeError, parse_at_ranges, parse_formula


def test_julia_range_inclusive():
    at = parse_at_ranges("x=-5:0.1:5")
    assert len(at["x"]) == 101  # Julia ranges include the endpoint
    np.testing.assert_allclose(at["x"][0], -5.0)
    np.testing.assert_allclose(at["x"][-1], 5.0)


def test_range_step_one():
    at = parse_at_ranges("x=1:10")
    np.testing.assert_array_equal(at["x"], np.arange(1.0, 11.0))


def test_rand_uniform():
    # ref intent: interface.jl:90-94
    at = parse_at_ranges("x = rand(Uniform(-5,5), 50)", seed=0)
    assert len(at["x"]) == 50
    lo, hi = at["x"].min(), at["x"].max()
    assert -5 < lo < hi < 5


def test_rand_normal():
    # ref intent: interface.jl:96-99
    at = parse_at_ranges("thing = rand(Normal(0,1), 100)", seed=0)
    assert len(at["thing"]) == 100
    assert -0.5 < at["thing"].mean() < 0.5


def test_multiple_assignments_and_scalars():
    # legacy predict syntax (test/pred.jl:6): ;-separated, scalar values
    at = parse_at_ranges("nutrient=-5:0.1:5;PersonID=0;StoolPairs=0")
    assert len(at["nutrient"]) == 101
    np.testing.assert_array_equal(at["PersonID"], [0.0])
    np.testing.assert_array_equal(at["StoolPairs"], [0.0])


def test_list_values():
    at = parse_at_ranges("g=[1, 2, 5]")
    np.testing.assert_array_equal(at["g"], [1.0, 2.0, 5.0])


def test_default_ranges_fill():
    # ref: getatrange fills unspecified vars from _default_range
    # (interface.jl:57-63, abstractgp_translations.jl:3-6)
    spec = parse_formula("y ~| SqExp(:t) * Cat(:g) + Linear(:x)")
    at = parse_at_ranges("t=0:0.5:2", formula=spec.formula)
    np.testing.assert_allclose(at["t"], [0, 0.5, 1.0, 1.5, 2.0])
    np.testing.assert_array_equal(at["g"], [1.0, 2.0, 3.0])
    assert len(at["x"]) == 61  # -3:0.1:3
    np.testing.assert_allclose(at["x"][0], -3.0)


def test_errors():
    with pytest.raises(RangeError):
        parse_at_ranges("x + 1")
    with pytest.raises(RangeError):
        parse_at_ranges("x = rand(Gamma(1,1), 10)")
