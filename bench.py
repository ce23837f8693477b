"""Benchmark: 32k-atom LJ melt (bench/in.lj equivalent), atom-steps/s.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 1.41 M atom-steps/s (reference LAMMPS, 1 CPU core, icc 2016,
bench/log.6Oct16.lj.fixed.icc.1; see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_ATOM_STEPS_PER_S = 1.41e6
NSTEPS = 100
CELLS = 20  # 32000 atoms
T_INIT = 1.44
SEED = 87287


def main():
    from lammps_kokkos_port_tpu.presets import lj_melt_sim

    dtype = jnp.float32
    sim = lj_melt_sim(
        cells=CELLS, t_init=T_INIT, seed=SEED, dtype=dtype,
        every=20, delay=0, check=False,
    )
    sim.setup()
    natoms = int(jax.device_get(sim.state.nlocal))

    # warmup: compile the segment and run it once
    runner = sim._get_segment_runner()
    s, l = runner(sim.state, sim.nl, NSTEPS)
    jax.block_until_ready(s.x)

    # timed run (fresh state not needed for throughput; steady-state physics)
    t0 = time.perf_counter()
    s, l = runner(s, l, NSTEPS)
    jax.block_until_ready(s.x)
    dt = time.perf_counter() - t0

    atom_steps_per_s = natoms * NSTEPS / dt
    print(
        json.dumps(
            {
                "metric": "lj_melt_32k_atom_steps_per_sec",
                "value": atom_steps_per_s,
                "unit": "atom-steps/s",
                "vs_baseline": atom_steps_per_s / BASELINE_ATOM_STEPS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
