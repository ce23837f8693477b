"""Reproduce + bisect the chute TPU compile fault (VERDICT r4 weak #3).

Builds the chute deck sim (grid granular engine) and jits ONE segment of
k steps, printing the failure. Use K env var to vary segment length and
GRAN_* env toggles to bisect kernel features.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/prof/repro_chute.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from lammps_kokkos_port_tpu.script import LammpsScript  # noqa: E402

K = int(os.environ.get("K", "1"))
# GMODE=matrix to test the [N,K] engine on TPU

cwd = os.getcwd()
os.chdir("/root/reference/bench")
try:
    s = LammpsScript(dtype=jnp.float32, list_mode=os.environ.get("GMODE", "grid"))
    deck = open("in.chute").read().replace("run             100", "run 0")
    for ln in deck.strip().splitlines():
        s.one(ln)
finally:
    os.chdir(cwd)

sim = s.sim
print(f"built: {int(jax.device_get(sim.state.nlocal))} atoms, "
      f"ncells={sim.nl.params.ncells} cc={sim.nl.params.cell_cap}",
      file=sys.stderr, flush=True)

runner = sim._get_segment_runner()
t0 = time.perf_counter()
try:
    st, l = runner(sim.state, sim.nl, K)
    jax.block_until_ready(st.x)
    print(f"k={K} OK in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
except Exception as e:  # noqa: BLE001
    print(f"k={K} FAILED after {time.perf_counter()-t0:.1f}s: "
          f"{type(e).__name__}: {e}", file=sys.stderr)
