"""EAM 32k: sorted Pallas vs grid dense rate."""
import time
import jax, jax.numpy as jnp
from lammps_kokkos_port_tpu.presets import eam_bulk_cu_sim

def rate(mode):
    sim = eam_bulk_cu_sim(cells=20, dtype=jnp.float32)
    sim._list_mode_req = mode
    sim.setup()
    n = int(jax.device_get(sim.state.nlocal))
    runner = sim._get_segment_runner()
    def timed(k):
        s, l = runner(sim.state, sim.nl, k)
        jax.block_until_ready(s.x)
        t0 = time.perf_counter()
        s, l = runner(sim.state, sim.nl, k)
        jax.block_until_ready(s.x)
        return time.perf_counter() - t0
    t1, t2 = timed(50), timed(150)
    per = (t2 - t1) / 100
    p = sim.nl.params
    print(f"eam-32k [{mode}] ncells={p.ncells} cc={p.cell_cap}: "
          f"{n/per/1e6:.2f} M atom-steps/s ({per*1e3:.2f} ms/step)", flush=True)

rate("sorted")
rate("grid")
