"""sbdart-compatible command-line entry point.

Like the reference binary: reads the namelist file `INPUT` from the working
directory (or a path given as argv[1]), runs, prints the `iout` output to
stdout.  Optional data files (atms.dat, albedo.dat, aerosol.dat, filter.dat,
solar.dat, usrcld.dat) are picked up from the working directory exactly as
the reference does (SURVEY.md section 4.4).

Usage:
    python -m sbdart_tpu.cli [INPUT_PATH]
"""

from __future__ import annotations

import sys


def _init_backend() -> None:
    """Make backend selection survive any JAX_PLATFORMS value.

    Some PJRT plugins ignore the JAX_PLATFORMS env var (requesting `cpu`
    still yields the plugin's devices), so when the var is set we also force
    it through jax.config.  But a plugin's own platform alias (e.g. `axon`)
    may not be a *config*-recognized backend name, in which case forcing it
    crashes backend init — the reference binary never refuses to start
    (sbdart.f main), so neither do we: on any failure we reset the config to
    automatic selection and let the plugin provide whatever it provides.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
        jax.devices()  # force backend init now, under our control
    except Exception:
        # automatic selection: clear both the config override and the env
        # var (config None falls back to the env var, which is the value
        # that just failed)
        os.environ.pop("JAX_PLATFORMS", None)
        jax.config.update("jax_platforms", None)
        jax.devices()


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv else "INPUT"

    _init_backend()

    from sbdart_tpu.namelist import load_namelist
    from sbdart_tpu.outputs import format_albtrn, format_iout
    from sbdart_tpu.pipeline import run_albtrn, run_pipeline

    cfg = load_namelist(path).validate()
    if cfg.ibcnd == 1:
        sys.stdout.write(format_albtrn(run_albtrn(cfg)))
        return 0
    res = run_pipeline(cfg)
    sys.stdout.write(format_iout(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
