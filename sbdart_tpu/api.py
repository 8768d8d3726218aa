"""High-level run API (single column / spectrum).  Fleshed out with the
pipeline; placeholder wiring lives here so the package imports cleanly while
the solver core is built bottom-up."""

from __future__ import annotations

from sbdart_tpu.config import Config


def run(cfg: Config, **kw):
    from sbdart_tpu.pipeline import run_pipeline

    return run_pipeline(cfg.validate(), **kw)


def run_spectrum(cfg: Config, **kw):
    return run(cfg, **kw)
