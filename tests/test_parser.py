"""Formula-parser unit tests.

Ports & extends the reference's inline parser testsets
(/root/reference/src/interface.jl:70-87) — the only live tests the reference
has — plus coverage for the legacy DSL surface (bare Noise, Cat(PersonID),
parameterized likelihoods; SURVEY.md §2.11).
"""

import pytest

from gaplac_tpu.dsl import (
    Cat,
    Constant,
    FormulaError,
    GPOperation,
    Linear,
    Noise,
    OU,
    SqExp,
    leaves,
    parse_formula,
    parse_kernel_expr,
    parse_likelihood,
    sum_of_products,
)


def test_simple_formula():
    # ref: interface.jl:71-75
    spec = parse_formula("y ~| SqExp(:t)")
    assert spec.likelihood.name == "gaussian"
    assert spec.response == "y"
    assert spec.formula == SqExp("t", l=1.0)


def test_sum_formula():
    # ref: interface.jl:77-81
    spec = parse_formula("bug ~| SqExp(:t) + Linear(:x)")
    assert spec.likelihood.name == "gaussian"
    assert spec.response == "bug"
    assert isinstance(spec.formula, GPOperation)
    assert spec.formula.op == "add"
    assert spec.varnames() == ("t", "x")


def test_product_formula():
    # ref: interface.jl:83-87
    spec = parse_formula("bug ~| SqExp(:t) * Cat(:g) + Linear(:x)")
    assert isinstance(spec.formula, GPOperation)
    assert spec.varnames() == ("t", "g", "x")
    terms = sum_of_products(spec.formula)
    assert terms == ((SqExp("t"), Cat("g")), (Linear("x"),))


def test_colon_tilde_gaussian_marker():
    # ":~|" => Gaussian marker too (ref: interface.jl:25, README.md:39)
    spec = parse_formula("y :~| SqExp(:x; l=1)")
    assert spec.likelihood.name == "gaussian"
    assert spec.formula == SqExp("x", l=1.0)


def test_hyperparams_semicolon_and_comma():
    # guide uses both separators (README.md:28,104)
    assert parse_kernel_expr("SqExp(:x; l=1.5)") == SqExp("x", l=1.5)
    assert parse_kernel_expr("SqExp(:x, l=2)") == SqExp("x", l=2.0)
    assert parse_kernel_expr("Linear(:x; c=-1.5)") == Linear("x", c=-1.5)
    assert parse_kernel_expr("OU(:t; l=0.5)") == OU("t", l=0.5)


def test_bare_and_legacy_kernels():
    # legacy DSL: bare Noise, Cat(PersonID) without colon (test/pred.jl:3)
    node = parse_kernel_expr("Cat(PersonID) * Cat(StoolPairs) + Cat(PersonID) + Linear(nutrient) + Noise")
    lvs = leaves(node)
    assert lvs == (
        Cat("PersonID"),
        Cat("StoolPairs"),
        Cat("PersonID"),
        Linear("nutrient"),
        Noise(""),
    )
    assert node.varnames() == ("PersonID", "StoolPairs", "PersonID", "nutrient")
    assert parse_kernel_expr("Constant(2.5)") == Constant("", c=2.5)
    assert parse_kernel_expr("Noise(s2=0.25)") == Noise("", s2=0.25)


def test_likelihoods():
    assert parse_likelihood("").name == "gaussian"
    assert parse_likelihood("Gaussian").name == "gaussian"
    g = parse_likelihood("Gaussian(.01)")  # legacy: test/oldtests.jl:11
    assert g.name == "gaussian" and g.args == (0.01,)
    b = parse_likelihood("Binomial(Reads)")  # legacy: test/oldtests.jl:25
    assert b.name == "binomial" and b.colref == "Reads"
    assert parse_likelihood("Bernoulli").name == "bernoulli"
    assert parse_likelihood("Poisson").name == "poisson"
    t = parse_likelihood("StudentT(4)")
    assert t.name == "studentt" and t.args == (4.0,)


def test_likelihood_in_formula():
    spec = parse_formula("y : Gaussian(0.5) ~| SqExp(:x)")
    assert spec.likelihood.name == "gaussian"
    assert spec.likelihood.args == (0.5,)


def test_errors():
    with pytest.raises(FormulaError):
        parse_formula("y SqExp(:x)")  # no ~|
    with pytest.raises(FormulaError):
        parse_formula("y ~ SqExp(:x)")  # ~ without |
    with pytest.raises(FormulaError):
        parse_kernel_expr("Banana(:x)")
    with pytest.raises(FormulaError):
        parse_kernel_expr("SqExp(:x; q=1)")
    with pytest.raises(FormulaError):
        parse_likelihood("Cauchy")
    with pytest.raises(ValueError):
        # product of sums unsupported (matches reference top-level walk)
        sum_of_products(parse_kernel_expr("SqExp(:a) * (Cat(:b) + Cat(:c))"))


def test_parenthesized_sum_parses():
    node = parse_kernel_expr("(SqExp(:a) + OU(:b))")
    assert isinstance(node, GPOperation) and node.op == "add"


def test_static_param_validation_and_no_kw_pos_mix():
    """Periodic p / RQ alpha are static (never sampled): bad values must fail
    at parse time; mixing keyword+positional params is rejected as ambiguous
    (a positional after a keyword used to be silently dropped)."""
    with pytest.raises(FormulaError):
        parse_kernel_expr("Periodic(:t; p=0)")
    with pytest.raises(FormulaError):
        parse_kernel_expr("Periodic(:t; p=-1.5)")
    with pytest.raises(FormulaError):
        parse_kernel_expr("RQ(:x; alpha=0)")
    with pytest.raises(FormulaError):
        parse_kernel_expr("Periodic(:t; l=2, 5)")
    with pytest.raises(FormulaError):
        parse_kernel_expr("SqExp(:x; l=2, 5)")
    # pure-positional and pure-keyword forms both still parse
    k = parse_kernel_expr("RQ(:x; l=1.5, alpha=3)")
    assert k.l == 1.5 and k.alpha == 3.0
    k = parse_kernel_expr("SqExp(:x; 2.5)")
    assert k.l == 2.5


def test_excess_positionals_and_alias_conflicts_rejected():
    """Excess positional params and conflicting keyword aliases must raise
    (both used to be silently discarded)."""
    for bad in (
        "Linear(:x, 5, 99)",
        "Cat(:g, 3)",
        "Periodic(:t, 1, 2, 7)",
        "SqExp(:x, 1, 2)",
        "Periodic(:t; p=2, period=3)",
        "RQ(:x; alpha=1, a=9)",
        "Noise(s2=4, s=9)",
    ):
        with pytest.raises(FormulaError):
            parse_kernel_expr(bad)
    # single-spelling forms still parse
    assert parse_kernel_expr("Periodic(:t; period=3)").p == 3.0
    assert parse_kernel_expr("RQ(:x; a=1.5)").alpha == 1.5
