"""Profile pieces of the local permute on TPU."""
import time, sys
import jax, jax.numpy as jnp
from functools import partial
from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import sortedforce

def scan_time(body, init, n=100):
    @partial(jax.jit, static_argnums=1)
    def run(c, k):
        def f(c, _):
            return body(c), None
        c, _ = jax.lax.scan(f, c, None, length=k)
        return c
    jax.block_until_ready(run(init, n))
    t0 = time.perf_counter(); jax.block_until_ready(run(init, n)); t1 = time.perf_counter() - t0
    jax.block_until_ready(run(init, 3 * n))
    t0 = time.perf_counter(); jax.block_until_ready(run(init, 3 * n)); t2 = time.perf_counter() - t0
    return (t2 - t1) / (2 * n)

sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287, dtype=jnp.float32,
                  every=20, delay=0, check=False)
sim.setup()
state, nl = sim.state, sim.nl
p = nl.params
cap = state.capacity

# full local perm + apply
def body_full(s):
    perm, ov = sortedforce._local_perm(s, p)
    s2, _ = sortedforce._apply_perm(s, perm, ov)
    return s2
print(f"local perm+apply: {scan_time(body_full, state)*1e3:.4f} ms", file=sys.stderr)

# perm computation only (chain via cheap dependence)
def body_perm(s):
    perm, ov = sortedforce._local_perm(s, p)
    return s.replace(x=s.x + 1e-30 * perm[0].astype(s.dtype))
print(f"perm only: {scan_time(body_perm, state)*1e3:.4f} ms", file=sys.stderr)

# gathers only (fixed perm)
perm0, _ = jax.jit(lambda s: sortedforce._local_perm(s, p))(state)
def body_gather(s):
    s2, _ = sortedforce._apply_perm(s, perm0, jnp.asarray(False))
    return s2
print(f"apply (gathers) only: {scan_time(body_gather, state)*1e3:.4f} ms", file=sys.stderr)

# x-gather alone
def body_xg(s):
    return s.replace(x=s.x[jnp.minimum(perm0, cap - 1)])
print(f"x gather alone: {scan_time(body_xg, state)*1e3:.4f} ms", file=sys.stderr)
