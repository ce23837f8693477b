"""Bisect the local perm cost."""
import time, sys
import jax, jax.numpy as jnp
from functools import partial
from lammps_kokkos_port_tpu.presets import lj_melt_sim

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
cc = p.cell_cap
ntot = p.total_cells
nx, ny, nz = p.ncells
dims = jnp.asarray([nx, ny, nz], dtype=jnp.int32)

def cells_of(s):
    lamda = s.box.to_lamda(s.x)
    frac = lamda - jnp.floor(lamda)
    frac = jnp.clip(frac, 0.0, 1.0 - 1e-7)
    c_new = jnp.floor(frac * dims.astype(frac.dtype)).astype(jnp.int32)
    return jnp.clip(c_new, 0, dims - 1)

def o_of(s):
    c_new = cells_of(s)
    row = jnp.arange(cap, dtype=jnp.int32)
    oldcell = row // cc
    ox = oldcell // (ny * nz)
    rem = oldcell - ox * (ny * nz)
    c_old = jnp.stack([ox, rem // nz, rem - (rem // nz) * nz], axis=1)
    d = c_new - c_old
    half = dims // 2
    d = jnp.where(d > half, d - dims, jnp.where(d < -half, d + dims, d))
    o = (d[:, 0] + 1) * 9 + (d[:, 1] + 1) * 3 + (d[:, 2] + 1)
    return jnp.clip(o, 0, 26), c_new

dep = lambda s, val: s.replace(x=s.x + 1e-30 * val.astype(s.dtype))

# a) cell/offset computation
print(f"a cells+o: {scan_time(lambda s: dep(s, o_of(s)[0][0]), state)*1e3:.4f} ms", file=sys.stderr)

# b) one-hot cumsum rank
def b(s):
    o, _ = o_of(s)
    o_rs = o.reshape(ntot, cc)
    v_rs = s.valid_mask.reshape(ntot, cc)
    oh = ((o_rs[:, None, :] == jnp.arange(27, dtype=jnp.int32)[None, :, None])
          & v_rs[:, None, :]).astype(jnp.int8)
    cum = jnp.cumsum(oh, axis=-1)
    rank_all = (cum - oh).astype(jnp.int32)
    rank = jnp.take_along_axis(rank_all, o_rs[:, None, :], axis=1)[:, 0, :]
    return dep(s, rank[0, 0] + cum[0, 0, -1])
print(f"b oh+cumsum+rank: {scan_time(b, state)*1e3:.4f} ms", file=sys.stderr)

# c) rolls + base
def c(s):
    o, c_new = o_of(s)
    counts = jnp.ones((ntot, 27), jnp.int32) + o[0]
    counts3 = counts.reshape(nx, ny, nz, 27)
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    arr = jnp.stack([jnp.roll(counts3[..., k], offs[k], axis=(0, 1, 2)) for k in range(27)], axis=-1)
    base = (jnp.cumsum(arr, axis=-1) - arr).reshape(ntot, 27)
    return dep(s, base[0, 0])
print(f"c rolls+base: {scan_time(c, state)*1e3:.4f} ms", file=sys.stderr)

# d) scatter
row = jnp.arange(cap, dtype=jnp.int32)
def d(s):
    o, c_new = o_of(s)
    dcell = (c_new[:, 0] * ny + c_new[:, 1]) * nz + c_new[:, 2]
    newpos = jnp.minimum(dcell * cc + o, cap - 1)
    perm = jnp.full((cap,), cap, dtype=jnp.int32)
    perm = perm.at[jnp.where(s.valid_mask, newpos, cap)].set(row, mode="drop")
    return dep(s, perm[0])
print(f"d dcell+scatter (incl a): {scan_time(d, state)*1e3:.4f} ms", file=sys.stderr)
