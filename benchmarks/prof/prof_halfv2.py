"""Candidate v2 Newton-half column kernel vs the shipped V0.

v2 = z-chunked pair math (zb=2, register-resident intermediates),
ZERO id lanes (Newton i<j in the self block via a STATIC lane>sublane
mask; non-self blocks are always-valid by half-stencil construction;
self pairs and pad-pad pairs die on r2>0; pad-real dies on distance),
reactions accumulated per-chunk into a [nz, 14cc] scratch then folded
per (dx,dy) target (5 VMEM += instead of 42).

Correctness cross-check vs column_half_force_pallas included.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/prof/prof_halfv2.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import pallas_pair as pp

EPS = 1e-30


def scan_time(body, carry, k1=20, k2=60):
    def run(k):
        f = jax.jit(lambda c: jax.lax.scan(
            lambda c, _: (body(c), None), c, None, length=k)[0])
        out = f(carry)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(carry)
        jax.block_until_ready(out)
        return time.perf_counter() - t0
    t1, t2 = run(k1), run(k2)
    return (t2 - t1) / (k2 - k1) * 1e3


def make_v2(key, ncells, zb=2, approx=False):
    nx, ny, nz = ncells
    cutsq = key[-1]
    _, lj1, lj2, _ = key
    NB = len(pp._HALF)

    def kern(cc, prd_ref, gx, gy, gz, fx, fy, fz, cand, rev):
        pid = pl.program_id(0)
        nxi, nyi = jnp.int32(nx), jnp.int32(ny)
        cx = pid // nyi
        cy = pid - cx * nyi

        @pl.when(pid == 0)
        def _():
            z = jnp.zeros_like(fx)
            fx[...] = z
            fy[...] = z
            fz[...] = z

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

        for s_, (dx, dy, dz) in enumerate(pp._HALF):
            ncol, sx, sy = ncols[(dx, dy)]
            for ci, (ref, sh) in enumerate(((gx, sx), (gy, sy), (gz, None))):
                col = ref[ncol]
                if sh is not None:
                    col = col + sh
                blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
                if ci == 2 and dz != 0:
                    seam = (zrow == (nz - 1 if dz > 0 else 0))
                    blk = blk + jnp.where(
                        seam, jnp.float32(dz) * prd_ref[2], 0.0
                    ).astype(blk.dtype)
                cand[ci, :, s_ * cc:(s_ + 1) * cc] = blk

        # static Newton mask: self block (lanes [0, cc)) needs cand_idx >
        # own_idx; non-self blocks are unconditionally valid (each cell
        # pair appears once in the half stencil)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, cc, NB * cc), 2)
        own = jax.lax.broadcasted_iota(jnp.int32, (1, cc, NB * cc), 1)
        newton = jnp.logical_or(lane >= cc, lane > own)

        for z0 in range(0, nz, zb):
            zs = slice(z0, z0 + zb)
            own_x = gx[pid, zs][:, :, None]
            own_y = gy[pid, zs][:, :, None]
            own_z = gz[pid, zs][:, :, None]
            dxv = own_x - cand[0, zs][:, None, :]
            dyv = own_y - cand[1, zs][:, None, :]
            dzv = own_z - cand[2, zs][:, None, :]
            r2 = dxv * dxv + dyv * dyv + dzv * dzv
            # r2>0 kills the self pair and pad-pad pairs (shared sentinel);
            # pad-real pairs fail the cutoff by distance
            valid = jnp.logical_and(
                newton, jnp.logical_and(r2 < cutsq, r2 > 0.0))
            r2s = jnp.maximum(r2, 0.25)
            if approx:
                y = pl.reciprocal(r2s, approx=True)
                r2i = y * (2.0 - r2s * y)
            else:
                r2i = 1.0 / r2s
            r6 = r2i * r2i * r2i
            fpair = jnp.where(valid, r6 * (lj1 * r6 - lj2) * r2i, 0.0)
            fij_x = dxv * fpair
            fij_y = dyv * fpair
            fij_z = dzv * fpair
            fx[pid, zs] += jnp.sum(fij_x, axis=-1)
            fy[pid, zs] += jnp.sum(fij_y, axis=-1)
            fz[pid, zs] += jnp.sum(fij_z, axis=-1)
            rev[0, zs] = jnp.sum(fij_x, axis=-2)
            rev[1, zs] = jnp.sum(fij_y, axis=-2)
            rev[2, zs] = jnp.sum(fij_z, axis=-2)

        # fold reactions per (dx,dy) target in registers, 5 VMEM += total
        tacc = {}
        for s_, (dx, dy, dz) in enumerate(pp._HALF):
            for ci in range(3):
                blk = -rev[ci, :, s_ * cc:(s_ + 1) * cc]
                if dz:
                    blk = pltpu.roll(blk, dz % nz, axis=0)
                a = tacc.setdefault((dx, dy), [None, None, None])
                a[ci] = blk if a[ci] is None else a[ci] + blk
        for (dx, dy), (bx, by, bz) in tacc.items():
            ncol = ncols[(dx, dy)][0]
            fx[ncol] += bx
            fy[ncol] += by
            fz[ncol] += bz

    @functools.partial(jax.jit, static_argnames=())
    def call(gx, gy, gz, prd):
        nxy, nz_, cc = gx.shape
        dt = gx.dtype
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((nxy, nz_, cc), dt)
                     for _ in range(3)]
        return pl.pallas_call(
            functools.partial(kern, cc),
            grid=(nxy,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 3,
            out_specs=[full] * 3,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((3, nz, NB * cc), dt),
                            pltpu.VMEM((3, nz, NB * cc), dt)],
        )(prd, gx, gy, gz)

    return call


def main():
    sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287,
                      dtype=jnp.float32, every=20, delay=0, check=False)
    sim.setup()
    p = sim.nl.params
    nx, ny, nz = p.ncells
    cc = p.cell_cap
    cap = sim.state.capacity
    state = sim.state
    key = sim.forcefield.pair.kernel_key()
    ids = jnp.where(state.valid_mask,
                    jnp.arange(cap, dtype=jnp.int32),
                    -1).astype(state.dtype)
    prd = state.box.prd.astype(state.dtype)
    g = state.x.reshape(nx * ny, nz, cc, 3)
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
    gi = ids.reshape(nx * ny, nz, cc)

    # correctness: v2 vs shipped V0
    fx0, fy0, fz0 = pp.column_half_force_pallas(
        key, p.ncells, cap, gx, gy, gz, gi, prd)
    for zb, approx in ((2, False), (2, True)):
        v2 = make_v2(key, p.ncells, zb=zb, approx=approx)
        fx2, fy2, fz2 = v2(gx, gy, gz, prd)
        err = max(float(jnp.max(jnp.abs(fx2 - fx0))),
                  float(jnp.max(jnp.abs(fy2 - fy0))),
                  float(jnp.max(jnp.abs(fz2 - fz0))))
        scale = float(jnp.max(jnp.abs(fx0)))
        print(f"v2 zb={zb} approx={approx}: max abs err {err:.3e} "
              f"(scale {scale:.2e})", flush=True)

    def v0_body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = pp.column_half_force_pallas(
            key, p.ncells, cap, cgx, cgy, cgz, gi, prd)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
    print(f"V0 half        : {scan_time(v0_body, (gx, gy, gz)):.3f} ms",
          flush=True)

    for zb in (2, 4):
        for approx in (False, True):
            v2 = make_v2(key, p.ncells, zb=zb, approx=approx)

            def body(c, v2=v2):
                cgx, cgy, cgz = c
                fx, fy, fz = v2(cgx, cgy, cgz, prd)
                return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
            print(f"v2 zb={zb} approx={approx}: "
                  f"{scan_time(body, (gx, gy, gz)):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
