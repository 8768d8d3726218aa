"""Discrete-ordinates radiative-transfer solver core.

TPU-native replacement for the DISORT 2.0 solver embedded in the reference
(disort.f:DISORT and callees — see SURVEY.md section 3.2).  The public entry
point is :func:`sbdart_tpu.solver.disort.solve_rte`.
"""

try:  # disort.py is the last solver module built; keep subimports working
    from sbdart_tpu.solver.disort import solve_rte  # noqa: F401
except ImportError:  # pragma: no cover
    pass
