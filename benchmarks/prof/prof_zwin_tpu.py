"""32k LJ melt: zwin engine vs sorted engine, real TPU, fp32.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/prof/prof_zwin_tpu.py
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lammps_kokkos_port_tpu.presets import lj_melt_sim  # noqa: E402


def rate(mode, cells=20):
    sim = lj_melt_sim(cells=cells, t_init=1.44, seed=87287,
                      dtype=jnp.float32, every=20, delay=0, check=False)
    sim._list_mode_req = mode
    sim.setup()
    n = int(jax.device_get(sim.state.nlocal))
    sim._run_segment_retry(100)
    sim._run_segment_retry(300)
    if mode == "zwin":
        changed = sim.retune()
        print(f"  retune: {changed}", file=sys.stderr)
        sim._run_segment_retry(100)
    runner = sim._get_segment_runner()

    def timed(k):
        s, l = runner(sim.state, sim.nl, k)
        jax.block_until_ready(s.x)
        t0 = time.perf_counter()
        s, l = runner(sim.state, sim.nl, k)
        jax.block_until_ready(s.x)
        dt = time.perf_counter() - t0
        assert not bool(jax.device_get(l.overflow)), "overflow in timing"
        return dt

    t1, t2 = timed(100), timed(300)
    per = (t2 - t1) / 200
    if mode == "zwin":
        p = sim.nl.params
        print(f"  params: nx={p.nx} ny={p.ny} S={p.S} G={p.G} "
              f"WS={p.WS} WN={p.WN} OFF={p.OFF}", file=sys.stderr)
    print(f"{mode} [{n} atoms]: {n/per/1e6:.1f} M atom-steps/s "
          f"({per*1e3:.4f} ms/step)", file=sys.stderr, flush=True)
    return n / per


rate("zwin")
rate("sorted")
