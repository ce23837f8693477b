"""Does z-chunking the column pair math make intermediates register-
resident (VMEM-traffic-bound -> compute-bound)?

The monolithic [nz, cc, 14cc] chain materializes ~10 intermediates of
~113 MB aggregate per sweep in VMEM; if Mosaic can keep [zb, cc, 14cc]
chunks in vregs, the chain's VMEM traffic drops ~10x. Measures the
forward-only pair pass (no reactions) at several chunk sizes, plus an
op-fused variant (id-free validity via r2>0, fewer selects).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/prof/prof_zchunk.py
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
    p = sim.nl.params
    nx, ny, nz = p.ncells
    cc = p.cell_cap
    cap = sim.state.capacity
    state = sim.state
    key = sim.forcefield.pair.kernel_key()
    dt = state.dtype
    ids = jnp.where(state.valid_mask,
                    jnp.arange(cap, dtype=jnp.int32), -1).astype(dt)
    prd = state.box.prd.astype(dt)
    g = state.x.reshape(nx * ny, nz, cc, 3)
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
    gi = ids.reshape(nx * ny, nz, cc)
    nxy = nx * ny
    NB = len(pp._HALF)
    NJ = NB * cc
    cutsq = key[-1]
    _, lj1, lj2, _ = key
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nxy, nz, cc), dt) for _ in range(3)]

    def make(kern, scratch=True):
        def call(cgx, cgy, cgz):
            return pl.pallas_call(
                kern,
                grid=(nxy,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 4,
                out_specs=[full] * 3,
                out_shape=out_shape,
                scratch_shapes=(
                    [pltpu.VMEM((4, nz, NJ), dt)] if scratch else []),
            )(prd, cgx, cgy, cgz, gi)

        def body(c):
            cgx, cgy, cgz = c
            fx, fy, fz = call(cgx, cgy, cgz)
            return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
        return body

    def asm(pid, prd_ref, gx, gy, gz, gi, cand_scratch, bias_ids):
        """Shared candidate assembly (same as the shipped half kernel)."""
        nxi, nyi = jnp.int32(nx), jnp.int32(ny)
        cx = pid // nyi
        cy = pid - cx * nyi
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
            for ci, (ref, sh) in enumerate(((gx, sx), (gy, sy), (gz, None),
                                            (gi, None))):
                col = ref[ncol]
                if sh is not None:
                    col = col + sh
                if ci == 3 and s_ > 0 and bias_ids:
                    col = jnp.where(col >= 0.0, col + float(cap), -1.0)
                blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
                if ci == 2 and dz != 0:
                    seam = (zrow == (nz - 1 if dz > 0 else 0))
                    blk = blk + jnp.where(
                        seam, jnp.float32(dz) * prd_ref[2], 0.0
                    ).astype(blk.dtype)
                cand_scratch[ci, :, s_ * cc:(s_ + 1) * cc] = blk
        return ncols

    # ---- forward-only, z-chunked, WITH id compare (Newton-half valid) ----
    def fwd_kern(zb, prd_ref, gx, gy, gz, gi, fx, fy, fz, cand_scratch):
        pid = pl.program_id(0)
        asm(pid, prd_ref, gx, gy, gz, gi, cand_scratch, True)
        for z0 in range(0, nz, zb):
            own_x = gx[pid, z0:z0 + zb][:, :, None]
            own_y = gy[pid, z0:z0 + zb][:, :, None]
            own_z = gz[pid, z0:z0 + zb][:, :, None]
            own_i = gi[pid, z0:z0 + zb][:, :, None]
            dxv = own_x - cand_scratch[0, z0:z0 + zb][:, None, :]
            dyv = own_y - cand_scratch[1, z0:z0 + zb][:, None, :]
            dzv = own_z - cand_scratch[2, z0:z0 + zb][:, None, :]
            r2 = dxv * dxv + dyv * dyv + dzv * dzv
            ic = cand_scratch[3, z0:z0 + zb]
            valid = jnp.logical_and(own_i < ic[:, None, :], r2 < cutsq)
            r2s = jnp.where(valid, r2, 1.0)
            r2i = 1.0 / r2s
            r6 = r2i * r2i * r2i
            fpair = jnp.where(valid, r6 * (lj1 * r6 - lj2) * r2i, 0.0)
            fx[pid, z0:z0 + zb] = jnp.sum(dxv * fpair, axis=-1)
            fy[pid, z0:z0 + zb] = jnp.sum(dyv * fpair, axis=-1)
            fz[pid, z0:z0 + zb] = jnp.sum(dzv * fpair, axis=-1)

    for zb in (nz, 4, 2, 1):
        t = scan_time(make(functools.partial(fwd_kern, zb)), (gx, gy, gz))
        print(f"fwd zb={zb:2d}        : {t:.3f} ms", flush=True)

    # ---- op-fused: no ids at all (r2>0 kills self), arcp recip,
    #      single select ----
    def fused_kern(zb, prd_ref, gx, gy, gz, gi, fx, fy, fz, cand_scratch):
        pid = pl.program_id(0)
        asm(pid, prd_ref, gx, gy, gz, gi, cand_scratch, False)
        for z0 in range(0, nz, zb):
            own_x = gx[pid, z0:z0 + zb][:, :, None]
            own_y = gy[pid, z0:z0 + zb][:, :, None]
            own_z = gz[pid, z0:z0 + zb][:, :, None]
            dxv = own_x - cand_scratch[0, z0:z0 + zb][:, None, :]
            dyv = own_y - cand_scratch[1, z0:z0 + zb][:, None, :]
            dzv = own_z - cand_scratch[2, z0:z0 + zb][:, None, :]
            r2 = dxv * dxv + dyv * dyv + dzv * dzv
            valid = jnp.logical_and(r2 < cutsq, r2 > 0.0)
            r2s = jnp.maximum(r2, 0.25)
            y = pl.reciprocal(r2s, approx=True)
            r2i = y * (2.0 - r2s * y)
            r6 = r2i * r2i * r2i
            fpair = jnp.where(valid, r6 * (lj1 * r6 - lj2) * r2i, 0.0)
            fx[pid, z0:z0 + zb] = jnp.sum(dxv * fpair, axis=-1)
            fy[pid, z0:z0 + zb] = jnp.sum(dyv * fpair, axis=-1)
            fz[pid, z0:z0 + zb] = jnp.sum(dzv * fpair, axis=-1)

    for zb in (nz, 2, 1):
        t = scan_time(make(functools.partial(fused_kern, zb)), (gx, gy, gz))
        print(f"fused zb={zb:2d}      : {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
