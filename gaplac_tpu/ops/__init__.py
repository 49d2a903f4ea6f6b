from gaplac_tpu.ops import linalg, mvn

# Route large-n Cholesky through the blocked MXU-dominant factorization on
# TPU (parity-or-better vs XLA's native op; see ops/cholesky.py).
from gaplac_tpu.ops import cholesky as _cholesky

_cholesky.register(min_n=2048)
