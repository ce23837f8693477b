"""Ablate zcol kernel components on TPU: full / no-reaction / no-assembly /
pair-only, to locate the per-slot cost gap vs the sorted cell kernel."""
import time, sys, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import zcolforce
from lammps_kokkos_port_tpu.ops.pallas_pair import _terms_from_key
from lammps_kokkos_port_tpu.ops.pallas_zcol import _XYHALF

sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287, dtype=jnp.float32,
                  every=20, delay=0, check=False)
sim.setup()
state, nl = sim.state, sim.nl
p = nl.params
print("w:", p.w_self, p.w_cross, "gh:", p.gh, "G:", p.G,
      "colcap:", p.colcap, file=sys.stderr)

ext = zcolforce._ext_arrays(state, nl)
extT = ext.transpose(0, 2, 1)
prd = state.box.prd.astype(state.dtype)
key = sim.forcefield.pair.kernel_key()
cap = state.capacity


def make_kernel(mode):
    nx, ny, colcap, chunk = p.nx, p.ny, p.colcap, p.chunk
    w_self, w_cross, gh, idcap = p.w_self, p.w_cross, p.gh, cap
    G = p.G
    nchunk = colcap // chunk

    def kern(prd_ref, starts_ref, fills_ref, ext_ref, extT_ref,
             fT_ref, racc_ref, cblk):
        c = pl.program_id(0)
        nyi, nxi = jnp.int32(ny), jnp.int32(nx)
        cx = c // nyi
        cy = c - cx * nyi
        cutsq = key[-1]
        dt = racc_ref.dtype

        @pl.when(c == 0)
        def _():
            racc_ref[...] = jnp.zeros(racc_ref.shape, dt)

        cols = [(c, jnp.zeros((), dt), jnp.zeros((), dt))]
        for dx, dy in _XYHALF:
            wx, wy = cx + jnp.int32(dx), cy + jnp.int32(dy)
            ncx = jax.lax.rem(wx + nxi, nxi)
            ncy = jax.lax.rem(wy + nyi, nyi)
            sx = jnp.where(wx < 0, -prd_ref[0],
                           jnp.where(wx >= nxi, prd_ref[0], 0.0)).astype(dt)
            sy = jnp.where(wy < 0, -prd_ref[1],
                           jnp.where(wy >= nyi, prd_ref[1], 0.0)).astype(dt)
            cols.append((ncx * nyi + ncy, sx, sy))

        lane = jax.lax.broadcasted_iota(jnp.int32, (4, G), 1)
        big = jnp.asarray(1.0e8, dt)
        if mode != "noassembly":
            for k, (nc, _, _) in enumerate(cols):
                blk = ext_ref[nc]
                fill = fills_ref[nc]
                rolled = pltpu.roll(blk, fill - colcap, 1)
                out = jnp.where(lane < gh + fill, blk,
                                jnp.where(lane < gh + fill + gh, rolled, big))
                cblk[k] = out
        else:
            cblk[0] = ext_ref[c]

        offs = [0, w_self]
        for _ in range(3):
            offs.append(offs[-1] + w_cross)
        widths = [w_self] + [w_cross] * 4
        zero = jnp.zeros((), dt)
        bias = jnp.asarray(idcap, dt)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (3, G), 1)

        def do_chunk(t, r0):
            if mode == "noassembly":
                w = cblk[0]
            else:
                w = jnp.full((4, G), big, dt)
                for k in range(5):
                    o = offs[k]
                    s = starts_ref[c, t * 5 + k]
                    part = pltpu.roll(cblk[k], o - s, 1)
                    if k:
                        _, sx, sy = cols[k]
                        part = part + jnp.stack([sx, sy, zero, bias])[:, None]
                    inwin = jnp.logical_and(lane >= o, lane < o + widths[k])
                    w = jnp.where(inwin, part, w)

            own_x = extT_ref[0, r0:r0 + chunk, 0:1]
            own_y = extT_ref[0, r0:r0 + chunk, 1:2]
            own_z = extT_ref[0, r0:r0 + chunk, 2:3]
            own_i = extT_ref[0, r0:r0 + chunk, 3:4]
            dxv = own_x - w[0][None, :]
            dyv = own_y - w[1][None, :]
            dzv = own_z - w[2][None, :]
            r2 = dxv * dxv + dyv * dyv + dzv * dzv
            valid = jnp.logical_and(own_i < w[3][None, :], r2 < cutsq)
            fpair = jnp.where(valid, _terms_from_key(key, r2), 0.0)
            fij_x = dxv * fpair
            fij_y = dyv * fpair
            fij_z = dzv * fpair
            fsum = jnp.concatenate([
                jnp.sum(fij_x, axis=1, keepdims=True),
                jnp.sum(fij_y, axis=1, keepdims=True),
                jnp.sum(fij_z, axis=1, keepdims=True)], axis=1)
            fT_ref[0, t * chunk:(t + 1) * chunk, :] = fsum
            if mode in ("full", "noassembly"):
                rmat = jnp.stack([
                    jnp.sum(fij_x, axis=0),
                    jnp.sum(fij_y, axis=0),
                    jnp.sum(fij_z, axis=0)])
                for k in range(5):
                    o = offs[k]
                    s = starts_ref[c, t * 5 + k]
                    nc = cols[k][0]
                    inwin = jnp.logical_and(lane3 >= o,
                                            lane3 < o + widths[k])
                    rk = jnp.where(inwin, rmat, 0.0)
                    racc_ref[nc] -= pltpu.roll(rk, s - o, 1)

        fill_c = fills_ref[c]
        for t in range(nchunk):
            @pl.when(t * chunk < fill_c)
            def _(t=t):
                do_chunk(t, gh + t * chunk)

            @pl.when(t * chunk >= fill_c)
            def _(t=t):
                fT_ref[0, t * chunk:(t + 1) * chunk, :] = jnp.zeros(
                    (chunk, 3), jnp.float32)

    ncol = p.ncol
    f = pl.pallas_call(
        kern,
        grid=(ncol,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.G, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p.colcap, 3), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ncol, p.colcap, 3), jnp.float32),
            jax.ShapeDtypeStruct((ncol, 3, p.G), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((5, 4, p.G), jnp.float32)],
    )
    return f


def bench(mode):
    f = make_kernel(mode)

    @jax.jit
    def loop(ext, extT, starts, fills, prd):
        def body(c, _):
            fT, racc = f(prd, starts, fills, c[0], c[1])
            return (c[0] + 1e-30 * (racc.sum() + fT.sum()), c[1]), None
        (e, _), _ = jax.lax.scan(body, (ext, extT), None, length=100)
        return e

    r = loop(ext, extT, nl.starts, nl.fills, prd); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = loop(ext, extT, nl.starts, nl.fills, prd); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 100
    print(f"{mode}: {dt*1e3:.4f} ms/iter", file=sys.stderr)


for mode in ("pairs", "full", "noassembly"):
    bench(mode)
