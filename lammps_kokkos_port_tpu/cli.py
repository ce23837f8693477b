"""Command-line runner: `python -m lammps_kokkos_port_tpu.cli -in in.lj`.

The analog of the reference's main() driver (ref: src/main.cpp:40-117,
CLI flags src/lammps.cpp:267-455): reads an input script and executes it.
Supported flags: -in/-i, -log/-l, -echo/-e, -var/-v name value,
-fp32/-fp64 (precision override; the reference is fp64-only).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lammps_kokkos_port_tpu")
    ap.add_argument("-in", "-i", dest="infile", required=True)
    ap.add_argument("-log", "-l", dest="logfile", default=None)
    ap.add_argument("-echo", "-e", dest="echo", default="none",
                    choices=["none", "screen", "log", "both"])
    ap.add_argument("-var", "-v", dest="vars", nargs=2, action="append",
                    default=[], metavar=("NAME", "VALUE"))
    ap.add_argument("-fp64", action="store_true",
                    help="run in float64 (CPU or emulated on TPU)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    if args.fp64:
        import jax

        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64
    else:
        dtype = jnp.float32

    from .script import LammpsScript

    script = LammpsScript(
        dtype=dtype,
        log_file=args.logfile,
        echo=args.echo in ("screen", "both"),
        var_overrides=dict(args.vars),
    )
    script.file(args.infile)
    return 0


if __name__ == "__main__":
    sys.exit(main())
