"""gaplac_tpu — TPU-native Gaussian-Process inference engine.

A from-scratch JAX/XLA/Pallas framework with the capability envelope of
biobakery/GaPLAC (reference surveyed in SURVEY.md): a formula DSL
(``"y :~| SqExp(:x; l=1)"``) compiled to vectorized covariance builders and
log-marginal-likelihood programs, NUTS/HMC posterior sampling over kernel
hyperparameters, VI and SMC fast paths, Bayes-factor model selection, prior
sampling, posterior prediction, and multi-chain sharding over TPU meshes.

Reference parity map (file:line cites are into /root/reference):
  - formula DSL          -> gaplac_tpu.dsl        (src/interface.jl:12-34)
  - kernel AST           -> gaplac_tpu.dsl.ast    (src/gp_parts.jl:3-61)
  - AST->kernel compiler -> gaplac_tpu.kernels    (src/abstractgp_translations.jl:45-69)
  - Gram/Cholesky/MVN    -> gaplac_tpu.ops        (AbstractGPs FiniteGP internals)
  - NUTS / samplers      -> gaplac_tpu.inference  (Turing NUTS, CLI/src/mcmc.jl:41)
  - CLI                  -> gaplac_tpu.cli        (CLI/src/main.jl:1-106)
"""

__version__ = "0.1.0"

from gaplac_tpu.dsl.parser import parse_formula, Spec
from gaplac_tpu.dsl.ranges import parse_at_ranges
from gaplac_tpu.data.transforms import invnormaltransform

__all__ = [
    "parse_formula",
    "Spec",
    "parse_at_ranges",
    "invnormaltransform",
    "__version__",
]
