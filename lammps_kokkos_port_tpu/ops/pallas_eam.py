"""Pallas TPU kernels for the dense (Chebyshev-resampled) EAM path.

Two Newton-halved column sweeps over the sorted cell-major grid — the
EAM KernelA/B/C decomposition of the reference's Kokkos port
(ref: src/KOKKOS/pair_eam_kokkos.cpp:137-260) with the mid-compute comm
replaced by a whole-grid-in-VMEM pass:

  pass 1 (rho):   rho_i = sum_j g(u_ij), u = r^2 — symmetric pair term,
                  forward + reverse accumulation of the SAME scalar.
  (XLA between): fp_i = F'(rho_i) via the embedding Chebyshev fit.
  pass 2 (force): fpair = -((fp_i + fp_j) a(u) + b(u)) — the reference's
                  psip assembly (src/MANYBODY/pair_eam.cpp:268-292) on the
                  resampled tables of ops/eamdense.

The Chebyshev coefficients arrive as STATIC tuples baked into the kernel:
Clenshaw evaluation unrolls to 2 fused ops per degree on full candidate
lanes — table-free, gather-free. Layout, validity encoding (PAD_POS pads,
id-bias Newton compare) and the reaction-fold structure are shared with
ops/pallas_pair (see its module docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_pair as pp

Array = jax.Array


def _clenshaw_static(coeffs, x, lo, hi):
    """Clenshaw with python-scalar coefficients (baked into the kernel)."""
    t = (2.0 * x - (lo + hi)) * (1.0 / (hi - lo))
    t2 = 2.0 * t
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for c in coeffs[:0:-1]:
        b1, b2 = t2 * b1 - b2 + c, b1
    return t * b1 - b2 + coeffs[0]


def _assemble(cand_scratch, refs, pid, nx, ny, nz, cc, idcap, prd_ref,
              nchan):
    """Fill cand_scratch[ci, :, s*cc:(s+1)*cc] for the 14 half-stencil
    blocks from whole-grid VMEM refs (x, y, z, id[, fp])."""
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

    for s, (dx, dy, dz) in enumerate(pp._HALF):
        ncol, sx, sy = ncols[(dx, dy)]
        shifts = (sx, sy) + (None,) * (nchan - 2)
        for ci in range(nchan):
            col = refs[ci][ncol]
            if ci < 2:
                col = col + shifts[ci]
            if ci == 3 and s > 0:
                col = jnp.where(col >= 0.0, col + float(idcap), -1.0)
            blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
            if ci == 2 and dz != 0:
                seam = (zrow == (nz - 1 if dz > 0 else 0))
                blk = blk + jnp.where(
                    seam, jnp.float32(dz) * prd_ref[2], 0.0
                ).astype(blk.dtype)
            cand_scratch[ci, :, s * cc:(s + 1) * cc] = blk
    return ncols


def _pair_u(cand_scratch, gx, gy, gz, gi, pid, zs, cutsq, u_lo, u_hi):
    """(us, valid) for one z-chunk: clamped u = r^2 and the Newton-half
    validity mask."""
    own_x = gx[pid, zs][:, :, None]
    own_y = gy[pid, zs][:, :, None]
    own_z = gz[pid, zs][:, :, None]
    own_i = gi[pid, zs][:, :, None]
    dxv = own_x - cand_scratch[0, zs][:, None, :]
    dyv = own_y - cand_scratch[1, zs][:, None, :]
    dzv = own_z - cand_scratch[2, zs][:, None, :]
    r2 = dxv * dxv + dyv * dyv + dzv * dzv
    ic = cand_scratch[3, zs]
    valid = jnp.logical_and(own_i < ic[:, None, :], r2 < cutsq)
    us = jnp.clip(r2, u_lo, u_hi)
    return (dxv, dyv, dzv), us, valid


def _rho_kernel(tab, nx, ny, nz, cc, idcap, prd_ref,
                gx, gy, gz, gi, rho, cand_scratch):
    """Newton-halved density sweep: rho_i += g(u), rho_j += g(u)."""
    pid = pl.program_id(0)
    g_c, u_lo, u_hi, cutsq = tab

    @pl.when(pid == 0)
    def _():
        rho[...] = jnp.zeros_like(rho)

    ncols = _assemble(cand_scratch, (gx, gy, gz, gi), pid, nx, ny, nz, cc,
                      idcap, prd_ref, 4)

    NZB = 8
    fwd_c, rev_c = [], []
    for z0 in range(0, nz, NZB):
        zb = min(NZB, nz - z0)
        zs = slice(z0, z0 + zb)
        _, us, valid = _pair_u(cand_scratch, gx, gy, gz, gi, pid, zs,
                               cutsq, u_lo, u_hi)
        g = jnp.where(valid, _clenshaw_static(g_c, us, u_lo, u_hi), 0.0)
        fwd_c.append(jnp.sum(g, axis=-1))
        rev_c.append(jnp.sum(g, axis=-2))
    rho[pid] += jnp.concatenate(fwd_c, axis=0)
    rev = jnp.concatenate(rev_c, axis=0)  # [nz, 14cc]

    tacc = {}
    for s, (dx, dy, dz) in enumerate(pp._HALF):
        blk = rev[:, s * cc:(s + 1) * cc]
        if dz:
            blk = pltpu.roll(blk, dz % nz, axis=0)
        t = (dx, dy)
        tacc[t] = blk if t not in tacc else tacc[t] + blk
    for (dx, dy), blk in tacc.items():
        rho[ncols[(dx, dy)][0]] += blk


def _force_kernel(tab, nx, ny, nz, cc, idcap, prd_ref,
                  gx, gy, gz, gi, gfp, fx, fy, fz, cand_scratch):
    """Newton-halved force sweep with the fp = F'(rho) channel."""
    pid = pl.program_id(0)
    a_c, b_c, u_lo, u_hi, cutsq = tab

    @pl.when(pid == 0)
    def _():
        z = jnp.zeros_like(fx)
        fx[...] = z
        fy[...] = z
        fz[...] = z

    ncols = _assemble(cand_scratch, (gx, gy, gz, gi, gfp), pid, nx, ny, nz,
                      cc, idcap, prd_ref, 5)

    NZB = 8
    fwd_c, rev_c = [[], [], []], [[], [], []]
    for z0 in range(0, nz, NZB):
        zb = min(NZB, nz - z0)
        zs = slice(z0, z0 + zb)
        dvs, us, valid = _pair_u(cand_scratch, gx, gy, gz, gi, pid, zs,
                                 cutsq, u_lo, u_hi)
        fp_i = gfp[pid, zs][:, :, None]
        fp_j = cand_scratch[4, zs][:, None, :]
        a = _clenshaw_static(a_c, us, u_lo, u_hi)
        b = _clenshaw_static(b_c, us, u_lo, u_hi)
        fpair = jnp.where(valid, -((fp_i + fp_j) * a + b), 0.0)
        for ci in range(3):
            fij = dvs[ci] * fpair
            fwd_c[ci].append(jnp.sum(fij, axis=-1))
            rev_c[ci].append(jnp.sum(fij, axis=-2))
    fx[pid] += jnp.concatenate(fwd_c[0], axis=0)
    fy[pid] += jnp.concatenate(fwd_c[1], axis=0)
    fz[pid] += jnp.concatenate(fwd_c[2], axis=0)
    revs = [jnp.concatenate(c, axis=0) for c in rev_c]

    tacc = {}
    for s, (dx, dy, dz) in enumerate(pp._HALF):
        for ci in range(3):
            blk = -revs[ci][:, s * cc:(s + 1) * cc]
            if dz:
                blk = pltpu.roll(blk, dz % nz, axis=0)
            acc = tacc.setdefault((dx, dy), [None, None, None])
            acc[ci] = blk if acc[ci] is None else acc[ci] + blk
    for (dx, dy), acc in tacc.items():
        ncol = ncols[(dx, dy)][0]
        fx[ncol] += acc[0]
        fy[ncol] += acc[1]
        fz[ncol] += acc[2]


@functools.partial(jax.jit, static_argnames=("tab", "ncells", "idcap"))
def rho_pallas(tab, ncells, idcap, gx, gy, gz, gi, prd):
    nx, ny, nz = ncells
    nxy, _, cc = gx.shape
    dt = gx.dtype
    kern = functools.partial(_rho_kernel, tab, nx, ny, nz, cc, idcap)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(nxy,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 4,
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((nxy, nz, cc), dt),
        scratch_shapes=[pltpu.VMEM((4, nz, len(pp._HALF) * cc), dt)],
        interpret=jax.default_backend() != "tpu",
    )(prd, gx, gy, gz, gi)


@functools.partial(jax.jit, static_argnames=("tab", "ncells", "idcap"))
def force_pallas(tab, ncells, idcap, gx, gy, gz, gi, gfp, prd):
    nx, ny, nz = ncells
    nxy, _, cc = gx.shape
    dt = gx.dtype
    kern = functools.partial(_force_kernel, tab, nx, ny, nz, cc, idcap)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nxy, nz, cc), dt) for _ in range(3)]
    return pl.pallas_call(
        kern,
        grid=(nxy,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 5,
        out_specs=[full] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((5, nz, len(pp._HALF) * cc), dt)],
        interpret=jax.default_backend() != "tpu",
    )(prd, gx, gy, gz, gi, gfp)


def compute_force_sorted(style, tabs, state, cl):
    """Force-only dense EAM on a SortedCells state via the two Pallas
    sweeps. Returns f [cap, 3] in the sorted layout."""
    p = cl.params
    cap = state.capacity
    nx, ny, nz = p.ncells
    cc = p.cell_cap
    dt = state.dtype

    ids = jnp.where(state.valid_mask,
                    jnp.arange(cap, dtype=jnp.int32), -1).astype(dt)
    prd = state.box.prd.astype(dt)
    g = state.x.reshape(nx * ny, nz, cc, 3)
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
    gi = ids.reshape(nx * ny, nz, cc)

    u_lo, u_hi = tabs["u_range"]
    rho_lo, rho_hi = tabs["rho_range"]
    s_lo, s_hi = tabs["s_range"]
    cutsq = float(style.cutmax) ** 2

    rho_tab = (tuple(float(c) for c in tabs["g"]),
               float(u_lo), float(u_hi), cutsq)
    rho = rho_pallas(rho_tab, p.ncells, cap, gx, gy, gz, gi, prd)

    # fp = F'(rho) per atom (tiny XLA elementwise between the sweeps)
    from .eamdense import _clenshaw

    rho_flat = rho.reshape(-1)
    s = jnp.sqrt(jnp.clip(rho_flat, rho_lo, rho_hi))
    fp = jnp.where(state.valid_mask,
                   _clenshaw(tabs["Fp_s"], s, s_lo, s_hi) / (2.0 * s), 0.0)
    gfp = fp.astype(dt).reshape(nx * ny, nz, cc)

    f_tab = (tuple(float(c) for c in tabs["a"]),
             tuple(float(c) for c in tabs["b"]),
             float(u_lo), float(u_hi), cutsq)
    fx, fy, fz = force_pallas(f_tab, p.ncells, cap, gx, gy, gz, gi, gfp,
                              prd)
    return jnp.stack([fx.reshape(-1), fy.reshape(-1), fz.reshape(-1)],
                     axis=-1)
