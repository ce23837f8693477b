"""Profile LJ 32k step components on TPU (in-graph scan loops to amortize
the axon tunnel dispatch overhead)."""
import time, sys
import jax, jax.numpy as jnp
from functools import partial
from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import pallas_pair, sortedforce

def scan_time(make_body, init, n=200):
    """Time n in-graph iterations of body (carry -> carry)."""
    @partial(jax.jit, static_argnums=1)
    def run(c, k):
        body = make_body()
        def f(c, _):
            return body(c), None
        c, _ = jax.lax.scan(f, c, None, length=k)
        return c
    r = run(init, n)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(init, n)
    jax.block_until_ready(r)
    t1 = (time.perf_counter() - t0)
    r = run(init, 3 * n)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(init, 3 * n)
    jax.block_until_ready(r)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (2 * n)

sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287, dtype=jnp.float32,
                  every=20, delay=0, check=False)
sim.setup()
state, nl = sim.state, sim.nl
p = nl.params
print("list_mode:", sim.list_mode, "ncells:", p.ncells, "cell_cap:", p.cell_cap,
      "capacity:", state.capacity, file=sys.stderr)

cap = state.capacity
nx, ny, nz = p.ncells
cc = p.cell_cap
dt = state.dtype
key = sim.forcefield.pair.kernel_key()
ids = jnp.where(state.valid_mask, jnp.arange(cap, dtype=jnp.int32), -1).astype(dt)
prd = state.box.prd.astype(dt)
g = state.x.reshape(nx * ny, nz, cc, 3)

# 1. kernel only: carry = (gx,gy,gz); feed force back in so iterations chain
def kbody():
    def body(c):
        gx, gy, gz = c
        fx, fy, fz = pallas_pair.column_half_force_pallas(
            key, p.ncells, cap, gx, gy, gz, ids.reshape(nx*ny, nz, cc), prd)
        return (gx + 1e-30 * fx, gy + 1e-30 * fy, gz + 1e-30 * fz)
    return body
k = scan_time(kbody, (g[..., 0], g[..., 1], g[..., 2]))
print(f"kernel only: {k*1e3:.4f} ms/iter", file=sys.stderr)

# 2. integrate-only (no force): nve kicks on state
integ = sim.integrator
def ibody():
    def body(s):
        return integ.final_integrate(integ.initial_integrate(s))
    return body
i = scan_time(ibody, state)
print(f"integrate only: {i*1e3:.4f} ms/iter", file=sys.stderr)

# 3. full force pass (sortedforce.compute incl. reshape/stack)
def fbody():
    def body(s):
        f, _, _ = sortedforce.compute(sim.forcefield.pair, s, nl, False, False)
        return s.replace(x=s.x + 1e-30 * f)
    return body
f = scan_time(fbody, state)
print(f"force pass (compute): {f*1e3:.4f} ms/iter", file=sys.stderr)

# 4. rebuild (permute) in-graph
def rbody():
    def body(s):
        s2, _ = sortedforce.build(s, p)
        return s2
    return body
r = scan_time(rbody, state, n=50)
print(f"rebuild/permute: {r*1e3:.4f} ms/iter (/20 = {r/20*1e3:.4f})", file=sys.stderr)

# 5. full step
step_runner = sim._get_segment_runner()
def run_seg(n):
    s, l = step_runner(state, nl, n)
    jax.block_until_ready(s.x)
run_seg(100)
t0 = time.perf_counter(); run_seg(100); t1 = time.perf_counter() - t0
run_seg(300)
t0 = time.perf_counter(); run_seg(300); t2 = time.perf_counter() - t0
per = (t2 - t1) / 200
print(f"full step: {per*1e3:.4f} ms -> {32000/per/1e6:.1f} M atom-steps/s", file=sys.stderr)
