"""Isolate v3 plane-half costs at 1M: kernel vs rc output vs XLA wrapper."""
import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
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

sim = lj_melt_sim(cells=63, t_init=1.44, seed=87287, dtype=jnp.float32,
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

def v3_body(c):
    cgx, cgy, cgz = c
    fx, fy, fz = pp.plane_half_force_pallas(key, p.ncells, cap, cgx, cgy, cgz, gi4, prd)
    return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
print(f"v3 shipped     : {scan_time(v3_body, (gx4, gy4, gz4)):.2f} ms", flush=True)

# variant: forward-only (no rc output, no fold) — WRONG physics, timing only
def fwd_kernel(key, nz, cc, idcap, prd_ref, *refs):
    views = refs[:20]
    fx, fy, fz = refs[20:23]
    cand_scratch = refs[23]
    cutsq = key[-1]
    cols = {t: views[4 * k:4 * (k + 1)]
            for k, t in enumerate([(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)])}
    zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0)
    for s, (dx, dy, dz) in enumerate(pp._HALF):
        prefs = cols[(dx, dy)]
        for ci in range(4):
            col = prefs[ci][0, 0]
            if ci == 3 and s > 0:
                col = jnp.where(col >= 0.0, col + float(idcap), -1.0)
            blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
            if ci == 2 and dz != 0:
                seam = (zrow == (nz - 1 if dz > 0 else 0))
                blk = blk + jnp.where(seam, jnp.float32(dz) * prd_ref[2], 0.0).astype(blk.dtype)
            cand_scratch[ci, :, s * cc:(s + 1) * cc] = blk
    o = cols[(0, 0)]
    own_x = o[0][0, 0][:, :, None]; own_y = o[1][0, 0][:, :, None]
    own_z = o[2][0, 0][:, :, None]; own_i = o[3][0, 0][:, :, None]
    dxv = own_x - cand_scratch[0][:, None, :]
    dyv = own_y - cand_scratch[1][:, None, :]
    dzv = own_z - cand_scratch[2][:, None, :]
    r2 = dxv * dxv + dyv * dyv + dzv * dzv
    ic = cand_scratch[3]
    valid = jnp.logical_and(own_i < ic[:, None, :], r2 < cutsq)
    r2s = jnp.where(valid, r2, 1.0)
    fpair = jnp.where(valid, pp._terms_from_key(key, r2s), 0.0)
    fx[0, 0] = jnp.sum(dxv * fpair, axis=-1)
    fy[0, 0] = jnp.sum(dyv * fpair, axis=-1)
    fz[0, 0] = jnp.sum(dzv * fpair, axis=-1)

@functools.partial(jax.jit, static_argnames=())
def fwd_call(gx, gy, gz, gi, prd):
    Lx, Ly = prd[0], prd[1]
    parts = []
    for a, arr in enumerate((gx, gy, gz, gi)):
        pz = jnp.concatenate([arr, arr[:1] + (Lx if a == 0 else 0.0)], axis=0)
        lo = pz[:, -1:] - (Ly if a == 1 else 0.0)
        hi = pz[:, :1] + (Ly if a == 1 else 0.0)
        parts.append(jnp.concatenate([lo, pz, hi], axis=1))
    quad = tuple(parts)
    kern = functools.partial(fwd_kernel, key, nz, cc, cap)
    def view(di, dj):
        return pl.BlockSpec((1, 1, nz, cc), lambda i, j, di=di, dj=dj: (i + di, j + dj, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for (dxs, dys) in ((0, 1), (0, 2), (1, 0), (1, 1), (1, 2)):
        in_specs.extend([view(dxs, dys)] * 4)
    outp = pl.BlockSpec((1, 1, nz, cc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nx, ny, nz, cc), dt)] * 3
    operands = []
    for _ in range(5):
        operands.extend(quad)
    return pl.pallas_call(kern, grid=(nx, ny), in_specs=in_specs,
                          out_specs=[outp] * 3, out_shape=out_shape,
                          scratch_shapes=[pltpu.VMEM((4, nz, 14 * cc), dt)],
                          )(prd, *operands)

def fwd_body(c):
    cgx, cgy, cgz = c
    fx, fy, fz = fwd_call(cgx, cgy, cgz, gi4, prd)
    return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
print(f"v3 forward-only: {scan_time(fwd_body, (gx4, gy4, gz4)):.2f} ms", flush=True)
