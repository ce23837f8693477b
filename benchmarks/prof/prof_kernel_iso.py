"""Isolate half-kernel costs: assembly / forward / reverse variants."""
import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import pallas_pair as pp

EPS = 1e-30

def make_kernel(mode):
    def kern(key, nx, ny, nz, cc, idcap, prd_ref,
             gx, gy, gz, gi, fx, fy, fz, cand_scratch):
        pid = pl.program_id(0)
        nxi, nyi = jnp.int32(nx), jnp.int32(ny)
        cx = pid // nyi
        cy = pid - cx * nyi
        cutsq = key[-1]
        if mode != "noreverse":
            @pl.when(pid == 0)
            def _():
                z = jnp.zeros_like(fx)
                fx[...] = z; fy[...] = z; fz[...] = z
        zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0)
        cols = sorted({(dx, dy) for dx, dy, _ in pp._HALF})
        ncols = {}
        for dx, dy in cols:
            wx = cx + jnp.int32(dx); wy = cy + jnp.int32(dy)
            ncx = jax.lax.rem(wx + nxi, nxi); ncy = jax.lax.rem(wy + nyi, nyi)
            sx = jnp.where(wx < 0, -prd_ref[0], jnp.where(wx >= nxi, prd_ref[0], 0.0))
            sy = jnp.where(wy < 0, -prd_ref[1], jnp.where(wy >= nyi, prd_ref[1], 0.0))
            ncols[(dx, dy)] = (ncx * nyi + ncy, sx, sy)
        if mode != "noassembly":
            for s, (dx, dy, dz) in enumerate(pp._HALF):
                ncol, sx, sy = ncols[(dx, dy)]
                for ci, (ref, sh) in enumerate(((gx, sx), (gy, sy), (gz, None), (gi, None))):
                    col = ref[ncol]
                    if sh is not None: col = col + sh
                    if ci == 3 and s > 0:
                        col = jnp.where(col >= 0.0, col + float(idcap), -1.0)
                    blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
                    if ci == 2 and dz != 0:
                        seam = (zrow == (nz - 1 if dz > 0 else 0))
                        blk = blk + jnp.where(seam, jnp.float32(dz) * prd_ref[2], 0.0).astype(blk.dtype)
                    cand_scratch[ci, :, s * cc:(s + 1) * cc] = blk
        own_x = gx[pid][:, :, None]; own_y = gy[pid][:, :, None]
        own_z = gz[pid][:, :, None]; own_i = gi[pid][:, :, None]
        dxv = own_x - cand_scratch[0][:, None, :]
        dyv = own_y - cand_scratch[1][:, None, :]
        dzv = own_z - cand_scratch[2][:, None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        ic = cand_scratch[3]
        valid = jnp.logical_and(own_i < ic[:, None, :], r2 < cutsq)
        r2s = jnp.where(valid, r2, 1.0)
        fpair = jnp.where(valid, pp._terms_from_key(key, r2s), 0.0)
        fij_x = dxv * fpair; fij_y = dyv * fpair; fij_z = dzv * fpair
        if mode == "noreverse":
            fx[pid] = jnp.sum(fij_x, axis=-1)
            fy[pid] = jnp.sum(fij_y, axis=-1)
            fz[pid] = jnp.sum(fij_z, axis=-1)
            return
        fx[pid] += jnp.sum(fij_x, axis=-1)
        fy[pid] += jnp.sum(fij_y, axis=-1)
        fz[pid] += jnp.sum(fij_z, axis=-1)
        rx = jnp.sum(fij_x, axis=-2); ry = jnp.sum(fij_y, axis=-2); rz = jnp.sum(fij_z, axis=-2)
        if mode == "redonly":
            # reductions happen; reactions written to own column only (wrong
            # physics, isolates the dynamic-index RMW cost)
            fx[pid] += -rx[:, :cc]; fy[pid] += -ry[:, :cc]; fz[pid] += -rz[:, :cc]
            return
        if mode == "batched":
            # fold dz in registers, one RMW per unique (dx,dy) target
            targets = {}
            for s, (dx, dy, dz) in enumerate(pp._HALF):
                key2 = (dx, dy)
                for ci, r in enumerate((rx, ry, rz)):
                    blk = -r[:, s * cc:(s + 1) * cc]
                    if dz: blk = pltpu.roll(blk, dz % nz, axis=0)
                    acc = targets.setdefault(key2, [None, None, None])
                    acc[ci] = blk if acc[ci] is None else acc[ci] + blk
            for (dx, dy), acc in targets.items():
                ncol = ncols[(dx, dy)][0]
                fx[ncol] += acc[0]; fy[ncol] += acc[1]; fz[ncol] += acc[2]
            return
        # mode == "full": shipped behavior
        for s, (dx, dy, dz) in enumerate(pp._HALF):
            ncol = ncols[(dx, dy)][0]
            for ref, r in ((fx, rx), (fy, ry), (fz, rz)):
                blk = -r[:, s * cc:(s + 1) * cc]
                if dz: blk = pltpu.roll(blk, dz % nz, axis=0)
                ref[ncol] += blk
    return kern

def build(mode, key, ncells, idcap, gi, prd, nxy, nz, cc, dt):
    kern = functools.partial(make_kernel(mode), key, *ncells, cc, idcap)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nxy, nz, cc), dt) for _ in range(3)]
    def call(cgx, cgy, cgz):
        return pl.pallas_call(
            kern, grid=(nxy,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 4,
            out_specs=[full] * 3, out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((4, nz, len(pp._HALF) * cc), dt)],
        )(prd, cgx, cgy, cgz, gi)
    def body(c):
        cgx, cgy, cgz = c
        fx, fy, fz = call(cgx, cgy, cgz)
        return (cgx + EPS * fx, cgy + EPS * fy, cgz + EPS * fz)
    return body, call

def scan_time(body, carry, k1=100, k2=300):
    def run(k):
        fn = jax.jit(lambda c: jax.lax.scan(lambda c, _: (body(c), None), c, None, length=k)[0])
        out = fn(carry); jax.block_until_ready(out)
        t0 = time.perf_counter(); out = fn(carry); jax.block_until_ready(out)
        return time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t1, t2 = run(k1), run(k2)
        best = min(best, (t2 - t1) / (k2 - k1) * 1e3)
    return best

def main():
    sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287, dtype=jnp.float32,
                      every=20, delay=0, check=False)
    sim.setup()
    p = sim.nl.params; nx, ny, nz = p.ncells; cc = p.cell_cap
    cap = sim.state.capacity; state = sim.state
    key = sim.forcefield.pair.kernel_key(); dt = state.dtype
    ids = jnp.where(state.valid_mask, jnp.arange(cap, dtype=jnp.int32), -1).astype(dt)
    prd = state.box.prd.astype(dt)
    g = state.x.reshape(nx * ny, nz, cc, 3)
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
    gi = ids.reshape(nx * ny, nz, cc)
    import numpy as np
    ref = None
    for mode in ("full", "batched", "redonly", "noreverse", "noassembly"):
        body, call = build(mode, key, p.ncells, cap, gi, prd, nx*ny, nz, cc, dt)
        t = scan_time(body, (gx, gy, gz))
        note = ""
        if mode in ("full", "batched"):
            f = call(gx, gy, gz)
            if ref is None: ref = f
            else:
                err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(ref, f))
                note = f"  parity vs full: {err:.2e}"
        print(f"{mode:12s}: {t:.3f} ms{note}", flush=True)

if __name__ == "__main__":
    main()
