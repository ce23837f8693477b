"""Dissect the 1M-atom step: force kernel vs rebuild vs glue."""
import functools, time
import jax, jax.numpy as jnp
from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import pallas_pair as pp

EPS = 1e-30

def scan_time(body, carry, k1=10, k2=30, reps=3):
    def run(k):
        fn = jax.jit(lambda c: jax.lax.scan(lambda c, _: (body(c), None), c, None, length=k)[0])
        out = fn(carry); jax.block_until_ready(out)
        t0 = time.perf_counter(); out = fn(carry); jax.block_until_ready(out)
        return time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t1, t2 = run(k1), run(k2)
        best = min(best, (t2 - t1) / (k2 - k1) * 1e3)
    return best

def main():
    sim = lj_melt_sim(cells=63, t_init=1.44, seed=87287, dtype=jnp.float32,
                      every=20, delay=0, check=False)
    sim.setup()
    p = sim.nl.params; nx, ny, nz = p.ncells; cc = p.cell_cap
    cap = sim.state.capacity; state = sim.state
    natoms = int(jax.device_get(state.nlocal))
    print(f"natoms={natoms} ncells={p.ncells} cc={cc} cap={cap} "
          f"fits_half={pp.plane_half_fits(p)}", flush=True)
    key = sim.forcefield.pair.kernel_key(); dt = state.dtype
    ids = jnp.where(state.valid_mask, jnp.arange(cap, dtype=jnp.int32), -1).astype(dt)
    prd = state.box.prd.astype(dt)
    g5 = state.x.reshape(nx, ny, nz, cc, 3)
    gx, gy, gz = g5[..., 0], g5[..., 1], g5[..., 2]
    gi = ids.reshape(nx, ny, nz, cc)

    # full step
    runner = sim._get_segment_runner()
    def seg(k):
        s, l = runner(state, sim.nl, k)
        jax.block_until_ready(s.x)
        t0 = time.perf_counter()
        s, l = runner(state, sim.nl, k)
        jax.block_until_ready(s.x)
        return time.perf_counter() - t0
    ta, tb = seg(40), seg(120)
    print(f"step          : {(tb-ta)/80*1e3:.2f} ms", flush=True)

    # plane_half kernel alone
    def ph_body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = pp.plane_half_force_pallas(key, p.ncells, cap, cgx, cgy, cgz, gi, prd)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
    print(f"plane_half    : {scan_time(ph_body, (gx, gy, gz)):.2f} ms", flush=True)

    # plane full kernel
    def pf_body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = pp.plane_force_pallas(key, p.ncells, cgx, cgy, cgz, gi, prd)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
    print(f"plane_full    : {scan_time(pf_body, (gx, gy, gz)):.2f} ms", flush=True)

    # rebuild cost (amortized 1/20 per step in the bench)
    from lammps_kokkos_port_tpu.ops import sortedforce
    reb = jax.jit(lambda st, nl: sortedforce.rebuild_state(st, nl))
    s2, n2 = reb(state, sim.nl)
    jax.block_until_ready(s2.x)
    t0 = time.perf_counter()
    for _ in range(5):
        s2, n2 = reb(state, sim.nl)
    jax.block_until_ready(s2.x)
    print(f"rebuild       : {(time.perf_counter()-t0)/5*1e3:.2f} ms (/20 = "
          f"{(time.perf_counter()-t0)/5/20*1e3:.3f} ms/step)", flush=True)

if __name__ == "__main__":
    main()
