"""Dissect rebuild_state at 1M: local perm vs scatter vs apply gathers."""
import time
import jax, jax.numpy as jnp
from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import sortedforce as sf

def t(fn, *a, reps=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3

sim = lj_melt_sim(cells=63, t_init=1.44, seed=87287, dtype=jnp.float32,
                  every=20, delay=0, check=False)
sim.setup()
state, nl = sim.state, sim.nl
p = nl.params
print(f"ncells={p.ncells} cc={p.cell_cap} cap={state.capacity}", flush=True)

print(f"rebuild_state : {t(jax.jit(lambda s, n: sf.rebuild_state(s, n)), state, nl):.2f} ms", flush=True)
print(f"_local_perm   : {t(jax.jit(lambda s: sf._local_perm(s, p)), state):.2f} ms", flush=True)
perm, ov = jax.jit(lambda s: sf._local_perm(s, p))(state)
print(f"_apply_perm   : {t(jax.jit(lambda s, pm: sf._apply_perm(s, pm, ov)), state, perm):.2f} ms", flush=True)

# scatter alone
cap = state.capacity
row = jnp.arange(cap, dtype=jnp.int32)
newpos = jnp.flip(row)
def scat(npos):
    pm = jnp.full((cap,), cap, dtype=jnp.int32)
    return pm.at[npos].set(row, mode="drop")
print(f"scatter [cap] : {t(jax.jit(scat), newpos):.2f} ms", flush=True)
def scat_u(npos):
    pm = jnp.full((cap,), cap, dtype=jnp.int32)
    return pm.at[npos].set(row, mode="drop", unique_indices=True)
print(f"scatter uniq  : {t(jax.jit(scat_u), newpos):.2f} ms", flush=True)
