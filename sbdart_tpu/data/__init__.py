"""Static physics data tables (the reference's L0 layer).

PROVENANCE: the reference mount was empty during this build (SURVEY.md
section 0), so the compiled-in DATA blocks of atms.f / taugas.f / taucloud.f /
tauaero.f / spectra.f / salbedo.f could not be extracted.  Every table in
this package is therefore REGENERATED from the same upstream physics the
reference encodes (McClatchey-class model atmospheres, band-model gas
absorption, Bohren–Huffman Mie theory, Shettle–Fenn-class aerosol models,
standard solar spectra) with provenance notes per module.  Numeric values
are physically consistent approximations, NOT bit-identical to SBDART's
tables; the module interfaces are designed so the reference tables can be
dropped in without code changes once the mount is populated (SURVEY.md
section 8.6 checklist).
"""
