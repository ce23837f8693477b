"""Profile the zcol LJ 32k step on TPU (in-graph scan loops)."""
import time, sys
import jax, jax.numpy as jnp
from functools import partial
from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import zcolforce

def scan_time(make_body, init, n=200):
    @partial(jax.jit, static_argnums=1)
    def run(c, k):
        body = make_body()
        def f(c, _):
            return body(c), None
        c, _ = jax.lax.scan(f, c, None, length=k)
        return c
    r = run(init, n); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = run(init, n); jax.block_until_ready(r)
    t1 = time.perf_counter() - t0
    r = run(init, 3 * n); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = run(init, 3 * n); jax.block_until_ready(r)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (2 * n)

sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287, dtype=jnp.float32,
                  every=20, delay=0, check=False)
sim.setup()
state, nl = sim.state, sim.nl
p = nl.params
print("list_mode:", sim.list_mode, "nx ny:", p.nx, p.ny,
      "colcap:", p.colcap, "w:", p.w_self, p.w_cross, "gh:", p.gh,
      "G:", p.G, "capacity:", state.capacity, file=sys.stderr)
print("overflow:", bool(nl.overflow), file=sys.stderr)

# force pass
def fbody():
    def body(s):
        f, _, _ = zcolforce.compute(sim.forcefield.pair, s, nl, False, False)
        return s.replace(x=s.x + 1e-30 * f)
    return body
f = scan_time(fbody, state)
print(f"force pass: {f*1e3:.4f} ms/iter", file=sys.stderr)

# rebuild in-graph
def rbody():
    def body(s):
        s2, _ = zcolforce.build(s, p)
        return s2
    return body
r = scan_time(rbody, state, n=50)
print(f"rebuild (full sort): {r*1e3:.4f} ms/iter (/20 = {r/20*1e3:.4f})",
      file=sys.stderr)

# full step
step_runner = sim._get_segment_runner()
def run_seg(n):
    s, l = step_runner(state, nl, n)
    jax.block_until_ready(s.x)
run_seg(100)
t0 = time.perf_counter(); run_seg(100); t1 = time.perf_counter() - t0
run_seg(300)
t0 = time.perf_counter(); run_seg(300); t2 = time.perf_counter() - t0
per = (t2 - t1) / 200
print(f"full step: {per*1e3:.4f} ms -> {32000/per/1e6:.1f} M atom-steps/s",
      file=sys.stderr)
