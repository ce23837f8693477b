"""v3 plane-half at 32k vs column kernel: per-program overhead check."""
import time
import jax, jax.numpy as jnp
from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import pallas_pair as pp

EPS = 1e-30

def scan_time(body, carry, k1=100, k2=300, reps=3):
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

sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287, dtype=jnp.float32,
                  every=20, delay=0, check=False)
sim.setup()
p = sim.nl.params; nx, ny, nz = p.ncells; cc = p.cell_cap
cap = sim.state.capacity; state = sim.state
key = sim.forcefield.pair.kernel_key(); dt = state.dtype
ids = jnp.where(state.valid_mask, jnp.arange(cap, dtype=jnp.int32), -1).astype(dt)
prd = state.box.prd.astype(dt)
g5 = state.x.reshape(nx, ny, nz, cc, 3)
gx4, gy4, gz4 = g5[..., 0], g5[..., 1], g5[..., 2]
gi4 = ids.reshape(nx, ny, nz, cc)
g = state.x.reshape(nx * ny, nz, cc, 3)
gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
gi = ids.reshape(nx * ny, nz, cc)

# parity
f0 = pp.column_half_force_pallas(key, p.ncells, cap, gx, gy, gz, gi, prd)
f1 = pp.plane_half_force_pallas(key, p.ncells, cap, gx4, gy4, gz4, gi4, prd)
err = max(float(jnp.max(jnp.abs(a.reshape(-1) - b.reshape(-1)))) for a, b in zip(f0, f1))
print(f"parity col vs v3: {err:.2e}", flush=True)

def col_body(c):
    cgx, cgy, cgz = c
    fx, fy, fz = pp.column_half_force_pallas(key, p.ncells, cap, cgx, cgy, cgz, gi, prd)
    return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
print(f"column_half 32k: {scan_time(col_body, (gx, gy, gz)):.3f} ms", flush=True)

def v3_body(c):
    cgx, cgy, cgz = c
    fx, fy, fz = pp.plane_half_force_pallas(key, p.ncells, cap, cgx, cgy, cgz, gi4, prd)
    return (cgx + EPS * fx.reshape(cgx.shape), cgy + EPS * fy.reshape(cgy.shape),
            cgz + EPS * fz.reshape(cgz.shape))
print(f"plane_half_v3 32k: {scan_time(v3_body, (gx4, gy4, gz4)):.3f} ms", flush=True)
