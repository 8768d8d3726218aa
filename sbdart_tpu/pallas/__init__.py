"""Pallas TPU kernels for the solver's hot ops.

XLA fallbacks exist for every kernel (the lax.scan block-Thomas in
solver/bvp.py); kernels are enabled on TPU backends and validated against
the fallbacks in tests (interpret mode on CPU).
"""

from sbdart_tpu.pallas.blocktri import (  # noqa: F401
    block_thomas,
    block_thomas_rt,
)
from sbdart_tpu.pallas.eig import eig_chain_lane_fused  # noqa: F401
