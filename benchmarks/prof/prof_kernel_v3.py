"""Kernel experiments toward the 100M+ atom-steps/s LJ step.

Findings from prof_sorted_ablate (real TPU, in-scan slopes):
  step 0.550 ms; V0 half kernel 0.468; pair math alone (504 lanes) 0.058;
  => the 56 unaligned [nz, cc] scratch slice writes (cc=36-lane offsets)
  and the 42 reaction-fold RMWs dominate. XLA gathers run at 9 GB/s
  in-scan, so neighbor-list gathers are not viable.

Variants here:
  K1: full-27 stencil, candidates assembled with jnp.concatenate in
      registers (no scratch), own-block-only aligned output writes.
  K2: like K1 but the pair loop runs per 9-column group (no concat at
      all: 9 blocks of [nz, 3cc]).
  K3: K1 with squared-distance via MXU dot (r2 = |xi|^2+|xj|^2-2xi.xj).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prof/prof_kernel_v3.py
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
    natoms = int(jax.device_get(sim.state.nlocal))
    p = sim.nl.params
    nx, ny, nz = p.ncells
    cc = p.cell_cap
    cap = sim.state.capacity
    print(f"natoms={natoms} ncells={p.ncells} cc={cc} cap={cap}", flush=True)

    state = sim.state
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

    def neighbor_blocks(pid, gx_, gy_, gz_, gi_, prd_ref):
        """Yield (xblk, yblk, zblk, iblk) [nz, cc] for the 27 stencil."""
        nxi, nyi = jnp.int32(nx), jnp.int32(ny)
        cx = pid // nyi
        cy = pid - cx * nyi
        zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0)
        for dx in (-1, 0, 1):
            wx = cx + jnp.int32(dx)
            ncx = jax.lax.rem(wx + nxi, nxi)
            sx = jnp.where(wx < 0, -prd_ref[0],
                           jnp.where(wx >= nxi, prd_ref[0], 0.0))
            for dy in (-1, 0, 1):
                wy = cy + jnp.int32(dy)
                ncy = jax.lax.rem(wy + nyi, nyi)
                sy = jnp.where(wy < 0, -prd_ref[1],
                               jnp.where(wy >= nyi, prd_ref[1], 0.0))
                ncol = ncx * nyi + ncy
                colx = gx_[ncol] + sx
                coly = gy_[ncol] + sy
                colz = gz_[ncol]
                coli = gi_[ncol]
                for dz in (-1, 0, 1):
                    bx, by = colx, coly
                    bz = pltpu.roll(colz, (-dz) % nz, axis=0) if dz else colz
                    bi = pltpu.roll(coli, (-dz) % nz, axis=0) if dz else coli
                    if dz:
                        bx = pltpu.roll(colx, (-dz) % nz, axis=0)
                        by = pltpu.roll(coly, (-dz) % nz, axis=0)
                        seam = (zrow == (nz - 1 if dz > 0 else 0))
                        bz = bz + jnp.where(
                            seam, jnp.float32(dz) * prd_ref[2], 0.0
                        ).astype(bz.dtype)
                    yield bx, by, bz, bi

    # ---- K1: full-27 via register concat -----------------------------------
    def k1_kernel(prd_ref, gx_, gy_, gz_, gi_, fx, fy, fz):
        pid = pl.program_id(0)
        bxs, bys, bzs, bis = [], [], [], []
        for bx, by, bz, bi in neighbor_blocks(pid, gx_, gy_, gz_, gi_,
                                              prd_ref):
            bxs.append(bx)
            bys.append(by)
            bzs.append(bz)
            bis.append(bi)
        cx_ = jnp.concatenate(bxs, axis=-1)  # [nz, 27cc]
        cy_ = jnp.concatenate(bys, axis=-1)
        cz_ = jnp.concatenate(bzs, axis=-1)
        ci_ = jnp.concatenate(bis, axis=-1)

        own_x = gx_[pid][:, :, None]
        own_y = gy_[pid][:, :, None]
        own_z = gz_[pid][:, :, None]
        own_i = gi_[pid][:, :, None]
        dxv = own_x - cx_[:, None, :]
        dyv = own_y - cy_[:, None, :]
        dzv = own_z - cz_[:, None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        valid = jnp.logical_and(
            jnp.logical_and(own_i != ci_[:, None, :],
                            (ci_ >= 0.0)[:, None, :]),
            r2 < cutsq,
        )
        r2s = jnp.where(valid, r2, 1.0)
        r2inv = 1.0 / r2s
        r6inv = r2inv * r2inv * r2inv
        fpair = jnp.where(valid, r6inv * (lj1 * r6inv - lj2) * r2inv, 0.0)
        fx[pid] = jnp.sum(dxv * fpair, axis=-1)
        fy[pid] = jnp.sum(dyv * fpair, axis=-1)
        fz[pid] = jnp.sum(dzv * fpair, axis=-1)

    # ---- K2: per-column accumulation, no concat -----------------------------
    def k2_kernel(prd_ref, gx_, gy_, gz_, gi_, fx, fy, fz):
        pid = pl.program_id(0)
        own_x = gx_[pid][:, :, None]
        own_y = gy_[pid][:, :, None]
        own_z = gz_[pid][:, :, None]
        own_i = gi_[pid][:, :, None]
        accx = jnp.zeros((nz, cc), dt)
        accy = jnp.zeros((nz, cc), dt)
        accz = jnp.zeros((nz, cc), dt)
        blocks = list(neighbor_blocks(pid, gx_, gy_, gz_, gi_, prd_ref))
        for s in range(0, 27, 3):
            bx = jnp.concatenate([blocks[s][0], blocks[s+1][0],
                                  blocks[s+2][0]], axis=-1)
            by = jnp.concatenate([blocks[s][1], blocks[s+1][1],
                                  blocks[s+2][1]], axis=-1)
            bz = jnp.concatenate([blocks[s][2], blocks[s+1][2],
                                  blocks[s+2][2]], axis=-1)
            bi = jnp.concatenate([blocks[s][3], blocks[s+1][3],
                                  blocks[s+2][3]], axis=-1)
            dxv = own_x - bx[:, None, :]
            dyv = own_y - by[:, None, :]
            dzv = own_z - bz[:, None, :]
            r2 = dxv * dxv + dyv * dyv + dzv * dzv
            valid = jnp.logical_and(
                jnp.logical_and(own_i != bi[:, None, :],
                                (bi >= 0.0)[:, None, :]),
                r2 < cutsq,
            )
            r2s = jnp.where(valid, r2, 1.0)
            r2inv = 1.0 / r2s
            r6inv = r2inv * r2inv * r2inv
            fpair = jnp.where(valid, r6inv * (lj1 * r6inv - lj2) * r2inv,
                              0.0)
            accx = accx + jnp.sum(dxv * fpair, axis=-1)
            accy = accy + jnp.sum(dyv * fpair, axis=-1)
            accz = accz + jnp.sum(dzv * fpair, axis=-1)
        fx[pid] = accx
        fy[pid] = accy
        fz[pid] = accz

    def make(kern):
        def call(cgx, cgy, cgz):
            return pl.pallas_call(
                kern,
                grid=(nxy,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 4,
                out_specs=[full] * 3,
                out_shape=out_shape,
            )(prd, cgx, cgy, cgz, gi)
        def body(c):
            cgx, cgy, cgz = c
            fx, fy, fz = call(cgx, cgy, cgz)
            return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
        return body

    print(f"K1 full27 concat : {scan_time(make(k1_kernel), (gx, gy, gz)):.3f} ms", flush=True)
    print(f"K2 col-group acc : {scan_time(make(k2_kernel), (gx, gy, gz)):.3f} ms", flush=True)

    # correctness check vs shipped kernel
    fr = pp.column_half_force_pallas(key, p.ncells, cap, gx, gy, gz, gi, prd)
    f1 = pl.pallas_call(
        k1_kernel, grid=(nxy,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 4,
        out_specs=[full] * 3, out_shape=out_shape,
    )(prd, gx, gy, gz, gi)
    for a, b, n in zip(fr, f1, "xyz"):
        err = jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30)
        print(f"K1 vs shipped f{n}: rel err {float(err):.2e}", flush=True)


if __name__ == "__main__":
    main()
