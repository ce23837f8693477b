"""cc=32 kernel variants: lane-aligned candidate assembly.

cc=36 makes every scratch slice write a misaligned RMW (the measured
bottleneck). With cc=32, 4 blocks tile to exactly 128 lanes.

Variants (all forced cc=32):
  T1: shipped half kernel (scratch writes at 32-lane offsets)
  T2: half kernel, scratch written as aligned 128-lane group tiles
      (concat groups of 4 [nz,32] blocks in registers -> aligned store)
  T4: pair-only floor at 448+64=512 lanes

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prof/prof_kernel_cc32.py
"""

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import pallas_pair as pp
from lammps_kokkos_port_tpu.ops import sortedforce, neighbor as nbr

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


def main():
    sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287,
                      dtype=jnp.float32, every=20, delay=0, check=False)
    sim.setup()

    # force cc=32 and re-sort the state into the tighter layout
    p32 = dataclasses.replace(sim.nl.params, cell_cap=32)
    state = sortedforce.expand_state(sim.state, p32)
    state, cl = sortedforce.build(state, p32)
    assert not bool(jax.device_get(cl.overflow)), "cc=32 overflowed"

    p = p32
    nx, ny, nz = p.ncells
    cc = 32
    cap = state.capacity
    natoms = int(jax.device_get(state.nlocal))
    print(f"natoms={natoms} ncells={p.ncells} cc={cc} cap={cap}", flush=True)

    style = sim.forcefield.pair
    key = style.kernel_key()
    dt = state.dtype
    ids = jnp.where(state.valid_mask,
                    jnp.arange(cap, dtype=jnp.int32), -1).astype(dt)
    prd = state.box.prd.astype(dt)
    g = state.x.reshape(nx * ny, nz, cc, 3)
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
    gi = ids.reshape(nx * ny, nz, cc)

    nxy = nx * ny
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nxy, nz, cc), dt) for _ in range(3)]
    _, lj1, lj2, cutsq = key
    NB = len(pp._HALF)  # 14
    NLANE = NB * cc  # 448

    # ---- T1: shipped half kernel at cc=32 -----------------------------------
    def t1_body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = pp.column_half_force_pallas(
            key, p.ncells, cap, cgx, cgy, cgz, gi, prd)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
    print(f"T1 shipped@32 : {scan_time(t1_body, (gx, gy, gz)):.3f} ms",
          flush=True)

    # ---- T2: aligned grouped-tile scratch assembly ---------------------------
    def t2_kernel(prd_ref, gx_, gy_, gz_, gi_, fx, fy, fz, cand):
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

        blocks = [[], [], [], []]  # per component: list of [nz, cc]
        for s, (dx, dy, dz) in enumerate(pp._HALF):
            ncol, sx, sy = ncols[(dx, dy)]
            for ci, (ref, sh) in enumerate(((gx_, sx), (gy_, sy),
                                            (gz_, None), (gi_, None))):
                col = ref[ncol]
                if sh is not None:
                    col = col + sh
                if ci == 3 and s > 0:
                    col = jnp.where(col >= 0.0, col + float(cap), -1.0)
                blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
                if ci == 2 and dz != 0:
                    seam = (zrow == (nz - 1 if dz > 0 else 0))
                    blk = blk + jnp.where(
                        seam, jnp.float32(dz) * prd_ref[2], 0.0
                    ).astype(blk.dtype)
                blocks[ci].append(blk)

        # grouped aligned stores: 4 blocks -> one [nz, 128] tile
        for ci in range(4):
            bl = blocks[ci]
            while len(bl) % 4:
                bl.append(jnp.full((nz, cc), -1.0, dt))
            for t in range(len(bl) // 4):
                tile = jnp.concatenate(bl[4 * t:4 * t + 4], axis=-1)
                cand[ci, :, 128 * t:128 * (t + 1)] = tile

        own_x = gx_[pid][:, :, None]
        own_y = gy_[pid][:, :, None]
        own_z = gz_[pid][:, :, None]
        own_i = gi_[pid][:, :, None]
        dxv = own_x - cand[0][:, None, :]
        dyv = own_y - cand[1][:, None, :]
        dzv = own_z - cand[2][:, None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        ic = cand[3]
        valid = jnp.logical_and(
            jnp.logical_and(own_i < ic[:, None, :], own_i >= 0.0),
            r2 < cutsq,
        )
        r2s = jnp.where(valid, r2, 1.0)
        r2inv = 1.0 / r2s
        r6inv = r2inv * r2inv * r2inv
        fpair = jnp.where(valid, r6inv * (lj1 * r6inv - lj2) * r2inv, 0.0)
        fij_x = dxv * fpair
        fij_y = dyv * fpair
        fij_z = dzv * fpair
        fx[pid] += jnp.sum(fij_x, axis=-1)
        fy[pid] += jnp.sum(fij_y, axis=-1)
        fz[pid] += jnp.sum(fij_z, axis=-1)

        rx = jnp.sum(fij_x, axis=-2)
        ry = jnp.sum(fij_y, axis=-2)
        rz = jnp.sum(fij_z, axis=-2)
        for s, (dx, dy, dz) in enumerate(pp._HALF):
            ncol, _, _ = ncols[(dx, dy)]
            for ref, r in ((fx, rx), (fy, ry), (fz, rz)):
                blk = -r[:, s * cc:(s + 1) * cc]
                if dz:
                    blk = pltpu.roll(blk, dz % nz, axis=0)
                ref[ncol] += blk

    NPAD = ((NLANE + 127) // 128) * 128  # 512

    def t2_call(cgx, cgy, cgz):
        return pl.pallas_call(
            t2_kernel,
            grid=(nxy,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 4,
            out_specs=[full] * 3,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((4, nz, NPAD), dt)],
        )(prd, cgx, cgy, cgz, gi)

    def t2_body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = t2_call(cgx, cgy, cgz)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)

    try:
        t = scan_time(t2_body, (gx, gy, gz))
        print(f"T2 aligned    : {t:.3f} ms", flush=True)
        # correctness vs shipped
        fr = pp.column_half_force_pallas(key, p.ncells, cap, gx, gy, gz,
                                         gi, prd)
        f2 = t2_call(gx, gy, gz)
        for a, b, n in zip(fr, f2, "xyz"):
            err = jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30)
            print(f"T2 vs shipped f{n}: rel err {float(err):.2e}", flush=True)
    except Exception as e:
        print(f"T2 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- T4: pair-only floor (512 lanes, constant scratch) ------------------
    def t4_kernel(prd_ref, gx_, gy_, gz_, gi_, fx, fy, fz, cand):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            cand[...] = jnp.zeros_like(cand) + 3.0

        own_x = gx_[pid][:, :, None]
        own_y = gy_[pid][:, :, None]
        own_z = gz_[pid][:, :, None]
        own_i = gi_[pid][:, :, None]
        dxv = own_x - cand[0][:, None, :]
        dyv = own_y - cand[1][:, None, :]
        dzv = own_z - cand[2][:, None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        ic = cand[3]
        valid = jnp.logical_and(
            jnp.logical_and(own_i < ic[:, None, :], own_i >= 0.0),
            r2 < cutsq,
        )
        r2s = jnp.where(valid, r2, 1.0)
        r2inv = 1.0 / r2s
        r6inv = r2inv * r2inv * r2inv
        fpair = jnp.where(valid, r6inv * (lj1 * r6inv - lj2) * r2inv, 0.0)
        fx[pid] = jnp.sum(dxv * fpair, axis=-1)
        fy[pid] = jnp.sum(dyv * fpair, axis=-1)
        fz[pid] = jnp.sum(dzv * fpair, axis=-1)

    def t4_call(cgx, cgy, cgz):
        return pl.pallas_call(
            t4_kernel,
            grid=(nxy,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 4,
            out_specs=[full] * 3,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((4, nz, NPAD), dt)],
        )(prd, cgx, cgy, cgz, gi)

    def t4_body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = t4_call(cgx, cgy, cgz)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)

    print(f"T4 pair floor : {scan_time(t4_body, (gx, gy, gz)):.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
