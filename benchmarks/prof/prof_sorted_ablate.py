"""Dissect the sorted column-half LJ kernel on real TPU (in-scan slopes).

Every measurement runs as jax.jit(lax.scan(body, length=k)) and is
slope-timed over two k values, so remote-dispatch latency and compile
cost cancel — the same protocol bench.py uses.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prof/prof_sorted_ablate.py
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
    """ms per iteration of body, slope-measured."""
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
    print(f"natoms={natoms} ncells={p.ncells} cc={cc} cap={cap} "
          f"lanes/atom={14*cc}", flush=True)

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

    # --- reference: the real step (bench protocol) ---------------------------
    runner = sim._get_segment_runner()
    def seg(k):
        s, l = runner(state, sim.nl, k)
        jax.block_until_ready(s.x)
        t0 = time.perf_counter()
        s, l = runner(state, sim.nl, k)
        jax.block_until_ready(s.x)
        return time.perf_counter() - t0
    ta, tb = seg(100), seg(300)
    print(f"step        : {(tb-ta)/200*1e3:.3f} ms", flush=True)

    # --- V0: shipped half kernel (in-scan) -----------------------------------
    def v0_body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = pp.column_half_force_pallas(
            key, p.ncells, cap, cgx, cgy, cgz, gi, prd)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
    print(f"V0 half     : {scan_time(v0_body, (gx, gy, gz)):.3f} ms", flush=True)

    # --- V1: full 27-block kernel --------------------------------------------
    def v1_body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = pp.column_force_pallas(key, p.ncells, cgx, cgy, cgz,
                                            gi, prd)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
    print(f"V1 full27   : {scan_time(v1_body, (gx, gy, gz)):.3f} ms", flush=True)

    # --- variant kernels ------------------------------------------------------
    nxy = nx * ny
    NB = len(pp._HALF)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nxy, nz, cc), dt) for _ in range(3)]

    def asm_only_kernel(prd_ref, gx, gy, gz, gi, fx, fy, fz, cand_scratch):
        pid = pl.program_id(0)
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
                blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
                if ci == 2 and dz != 0:
                    seam = (zrow == (nz - 1 if dz > 0 else 0))
                    blk = blk + jnp.where(
                        seam, jnp.float32(dz) * prd_ref[2], 0.0
                    ).astype(blk.dtype)
                cand_scratch[ci, :, s_ * cc:(s_ + 1) * cc] = blk
        fx[pid] = cand_scratch[0, :, :cc] + cand_scratch[1, :, :cc]
        fy[pid] = cand_scratch[2, :, :cc]
        fz[pid] = cand_scratch[3, :, :cc]

    def pair_only_kernel(approx, prd_ref, gx, gy, gz, gi,
                         fx, fy, fz, cand_scratch):
        pid = pl.program_id(0)
        cutsq = key[-1]
        _, lj1, lj2, _ = key

        @pl.when(pid == 0)
        def _():
            cand_scratch[...] = jnp.zeros_like(cand_scratch) + 3.0

        own_x = gx[pid][:, :, None]
        own_y = gy[pid][:, :, None]
        own_z = gz[pid][:, :, None]
        own_i = gi[pid][:, :, None]
        dxv = own_x - cand_scratch[0][:, None, :]
        dyv = own_y - cand_scratch[1][:, None, :]
        dzv = own_z - cand_scratch[2][:, None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        ic = cand_scratch[3]
        valid = jnp.logical_and(
            jnp.logical_and(own_i < ic[:, None, :], own_i >= 0.0),
            r2 < cutsq,
        )
        r2s = jnp.where(valid, r2, 1.0)
        if approx:
            r2inv = pl.reciprocal(r2s, approx=True)
        else:
            r2inv = 1.0 / r2s
        r6inv = r2inv * r2inv * r2inv
        fpair = jnp.where(valid, r6inv * (lj1 * r6inv - lj2) * r2inv, 0.0)
        fij_x = dxv * fpair
        fij_y = dyv * fpair
        fij_z = dzv * fpair
        fx[pid] = jnp.sum(fij_x, axis=-1)
        fy[pid] = jnp.sum(fij_y, axis=-1)
        fz[pid] = jnp.sum(fij_z, axis=-1)

    def make_call(kern, scratch_lanes):
        def call(cgx, cgy, cgz):
            return pl.pallas_call(
                kern,
                grid=(nxy,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 4,
                out_specs=[full] * 3,
                out_shape=out_shape,
                scratch_shapes=[pltpu.VMEM((4, nz, scratch_lanes), dt)],
            )(prd, cgx, cgy, cgz, gi)
        def body(c):
            cgx, cgy, cgz = c
            fx, fy, fz = call(cgx, cgy, cgz)
            return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
        return body

    print(f"V2 asm-only : {scan_time(make_call(asm_only_kernel, NB*cc), (gx, gy, gz)):.3f} ms", flush=True)
    print(f"V3 pair-only: {scan_time(make_call(functools.partial(pair_only_kernel, False), NB*cc), (gx, gy, gz)):.3f} ms", flush=True)
    print(f"V4 pair+arcp: {scan_time(make_call(functools.partial(pair_only_kernel, True), NB*cc), (gx, gy, gz)):.3f} ms", flush=True)

    # --- gather microbench (in-scan) ------------------------------------------
    xm = jnp.concatenate([state.x, ids[:, None]], axis=1)  # [cap, 4]
    for K, local in ((96, False), (128, False), (128, True)):
        if local:
            base = jnp.arange(natoms, dtype=jnp.int32)[:, None]
            off = jax.random.randint(jax.random.PRNGKey(1), (natoms, K),
                                     -512, 512)
            idx = jnp.clip(base + off, 0, cap - 1)
        else:
            idx = jax.random.randint(jax.random.PRNGKey(0), (natoms, K),
                                     0, cap)
        def gbody(c, idx=idx):
            gathered = c[idx]               # [N, K, 4]
            return c.at[:natoms].add(EPS * gathered[:, 0, :])
        t = scan_time(gbody, xm)
        print(f"gather K={K}{' local' if local else '      '}: {t:.3f} ms "
              f"({natoms*K*16/(t*1e-3)/1e9:.0f} GB/s)", flush=True)

    # --- [N, K] full-list force prototype (gather + pair math, no scatter) ----
    _, lj1, lj2, cutsq = key
    for K in (96, 128):
        base = jnp.arange(natoms, dtype=jnp.int32)[:, None]
        off = jax.random.randint(jax.random.PRNGKey(1), (natoms, K),
                                 -512, 512)
        idx = jnp.clip(base + off, 0, cap - 1)

        def nk_body(c, idx=idx):
            xj = c[idx]                      # [N, K, 3]
            d = c[:natoms, None, :] - xj
            r2 = jnp.sum(d * d, axis=-1)
            valid = r2 < cutsq
            r2s = jnp.where(valid, r2, 1.0)
            r2i = 1.0 / r2s
            r6 = r2i * r2i * r2i
            fp = jnp.where(valid, r6 * (lj1 * r6 - lj2) * r2i, 0.0)
            f = jnp.sum(d * fp[..., None], axis=1)  # [N, 3]
            return c.at[:natoms].add(EPS * f)
        t = scan_time(nk_body, state.x)
        print(f"[N,{K}] XLA full-list force: {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
