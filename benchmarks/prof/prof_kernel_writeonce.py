"""Prototype: write-once Newton-half column kernel + XLA reaction fold.

The shipped half kernel spends ~0.12 ms/step (32k atoms) on 39 in-kernel
read-modify-writes of [nz, cc] slabs at dynamic column indices (reaction
scatter). This variant writes the per-(dx,dy)-target reaction blocks as
extra kernel outputs (z-rolls folded in-kernel into 5 target blocks) and
folds them with periodic jnp.roll adds in XLA — zero in-kernel RMW.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prof/prof_kernel_writeonce.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import pallas_pair as pp

EPS = 1e-30

# reaction targets: unique (dx, dy) of the 13 non-trivial _HALF offsets,
# plus (0,0) for the self-column dz=+1 block and in-cell i<j reactions
_TARGETS = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
_TIDX = {t: i for i, t in enumerate(_TARGETS)}


def _wo_kernel(key, nx, ny, nz, cc, idcap, prd_ref,
               gx, gy, gz, gi, fx, fy, fz, rc, cand_scratch):
    pid = pl.program_id(0)
    nxi, nyi = jnp.int32(nx), jnp.int32(ny)
    cx = pid // nyi
    cy = pid - cx * nyi
    cutsq = key[-1]

    zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0)
    cols = sorted({(dx, dy) for dx, dy, _ in pp._HALF})
    ncols = {}
    for dx, dy in cols:
        wx = cx + jnp.int32(dx)
        wy = cy + jnp.int32(dy)
        ncx = jax.lax.rem(wx + nxi, nxi)
        ncy = jax.lax.rem(wy + nyi, nyi)
        sx = jnp.where(wx < 0, -prd_ref[0],
                       jnp.where(wx >= nxi, prd_ref[0], 0.0))
        sy = jnp.where(wy < 0, -prd_ref[1],
                       jnp.where(wy >= nyi, prd_ref[1], 0.0))
        ncols[(dx, dy)] = (ncx * nyi + ncy, sx, sy)

    for s, (dx, dy, dz) in enumerate(pp._HALF):
        ncol, sx, sy = ncols[(dx, dy)]
        for ci, (ref, sh) in enumerate(((gx, sx), (gy, sy), (gz, None),
                                        (gi, None))):
            col = ref[ncol]
            if sh is not None:
                col = col + sh
            if ci == 3 and s > 0:
                col = jnp.where(col >= 0.0, col + float(idcap), -1.0)
            blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
            if ci == 2 and dz != 0:
                seam = (zrow == (nz - 1 if dz > 0 else 0))
                blk = blk + jnp.where(
                    seam, jnp.float32(dz) * prd_ref[2], 0.0
                ).astype(blk.dtype)
            cand_scratch[ci, :, s * cc:(s + 1) * cc] = blk

    own_x = gx[pid][:, :, None]
    own_y = gy[pid][:, :, None]
    own_z = gz[pid][:, :, None]
    own_i = gi[pid][:, :, None]

    dxv = own_x - cand_scratch[0][:, None, :]
    dyv = own_y - cand_scratch[1][:, None, :]
    dzv = own_z - cand_scratch[2][:, None, :]
    r2 = dxv * dxv + dyv * dyv + dzv * dzv

    ic = cand_scratch[3]
    valid = jnp.logical_and(own_i < ic[:, None, :], r2 < cutsq)
    r2s = jnp.where(valid, r2, 1.0)
    fpair = jnp.where(valid, pp._terms_from_key(key, r2s), 0.0)

    fij_x = dxv * fpair
    fij_y = dyv * fpair
    fij_z = dzv * fpair
    fx[pid] = jnp.sum(fij_x, axis=-1)
    fy[pid] = jnp.sum(fij_y, axis=-1)
    fz[pid] = jnp.sum(fij_z, axis=-1)

    rx = jnp.sum(fij_x, axis=-2)  # [nz, 14cc]
    ry = jnp.sum(fij_y, axis=-2)
    rz = jnp.sum(fij_z, axis=-2)
    # fold the dz variants per (dx,dy) target in registers, store once
    accs = [[None, None, None] for _ in _TARGETS]
    for s, (dx, dy, dz) in enumerate(pp._HALF):
        t = _TIDX[(dx, dy)]
        for ci, r in enumerate((rx, ry, rz)):
            blk = -r[:, s * cc:(s + 1) * cc]
            if dz:
                blk = pltpu.roll(blk, dz % nz, axis=0)
            a = accs[t][ci]
            accs[t][ci] = blk if a is None else a + blk
    for t in range(len(_TARGETS)):
        for ci in range(3):
            rc[pid, ci, :, t * cc:(t + 1) * cc] = accs[t][ci]


@functools.partial(jax.jit, static_argnames=("key", "ncells", "idcap"))
def wo_half_force(key, ncells, idcap, gx, gy, gz, gi, prd):
    nx, ny, nz = ncells
    nxy, _, cc = gx.shape
    dt = gx.dtype
    kern = functools.partial(_wo_kernel, key, nx, ny, nz, cc, idcap)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nxy, nz, cc), dt) for _ in range(3)]
    out_shape.append(
        jax.ShapeDtypeStruct((nxy, 3, nz, len(_TARGETS) * cc), dt))
    fx, fy, fz, rc = pl.pallas_call(
        kern,
        grid=(nxy,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 4,
        out_specs=[full] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((4, nz, len(pp._HALF) * cc), dt)],
        interpret=jax.default_backend() != "tpu",
    )(prd, gx, gy, gz, gi)

    # XLA fold: periodic roll per target. rc[:, ci, :, t*cc:(t+1)*cc] holds
    # reactions owed to column (cx+dx, cy+dy) (z already aligned in-kernel)
    f = [fx, fy, fz]
    rc5 = rc.reshape(nx, ny, 3, nz, len(_TARGETS), cc)
    for t, (dx, dy) in enumerate(_TARGETS):
        blk = jnp.roll(rc5[:, :, :, :, t, :], (dx, dy), axis=(0, 1))
        for ci in range(3):
            f[ci] = f[ci] + blk[:, :, ci].reshape(nxy, nz, cc)
    return f[0], f[1], f[2]


def scan_time(body, carry, k1=20, k2=60):
    def run(k):
        fn = jax.jit(lambda c: jax.lax.scan(
            lambda c, _: (body(c), None), c, None, length=k)[0])
        out = fn(carry)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(carry)
        jax.block_until_ready(out)
        return time.perf_counter() - t0
    t1, t2 = run(k1), run(k2)
    return (t2 - t1) / (k2 - k1) * 1e3


def main():
    sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287,
                      dtype=jnp.float32, every=20, delay=0, check=False)
    sim.setup()
    natoms = int(jax.device_get(sim.state.nlocal))
    p = sim.nl.params
    nx, ny, nz = p.ncells
    cc = p.cell_cap
    cap = sim.state.capacity
    print(f"natoms={natoms} ncells={p.ncells} cc={cc} cap={cap}", flush=True)

    state = sim.state
    key = sim.forcefield.pair.kernel_key()
    dt = state.dtype
    ids = jnp.where(state.valid_mask,
                    jnp.arange(cap, dtype=jnp.int32), -1).astype(dt)
    prd = state.box.prd.astype(dt)
    g = state.x.reshape(nx * ny, nz, cc, 3)
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
    gi = ids.reshape(nx * ny, nz, cc)

    # parity check vs shipped kernel
    f0 = pp.column_half_force_pallas(key, p.ncells, cap, gx, gy, gz, gi, prd)
    f1 = wo_half_force(key, p.ncells, cap, gx, gy, gz, gi, prd)
    import numpy as np
    for a, b, n in zip(f0, f1, "xyz"):
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(a)))
        print(f"parity f{n}: max abs err {err:.3e} (scale {scale:.3e})",
              flush=True)

    def v0_body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = pp.column_half_force_pallas(
            key, p.ncells, cap, cgx, cgy, cgz, gi, prd)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
    print(f"V0 shipped half : {scan_time(v0_body, (gx, gy, gz)):.3f} ms",
          flush=True)

    def wo_body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = wo_half_force(key, p.ncells, cap, cgx, cgy, cgz, gi, prd)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
    print(f"W  write-once   : {scan_time(wo_body, (gx, gy, gz)):.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
