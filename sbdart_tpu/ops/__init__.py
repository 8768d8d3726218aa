"""Batched small-matrix linear algebra tuned for TPU.

Replaces the reference's L1 numerics layer (disutil.f: LINPACK
SGBCO/SGBFA/SGBSL banded LU, SGECO/SGEFA/SGESL dense LU, and the EISPACK-style
ASYMTX eigensolver in disort.f) with *batched* primitives: the reference
factors one small matrix at a time; here the batch axis
(column x band x k x mode x layer) is the vectorization surface.
"""

from sbdart_tpu.ops import lane  # noqa: F401
from sbdart_tpu.ops.batched_linalg import (  # noqa: F401
    eigh_small,
    jacobi_eigh,
    gauss_solve,
    cholesky_small,
)
