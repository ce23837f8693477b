"""KSpace style msm: multilevel summation method electrostatics.

TPU-native re-design of the reference MSM (ref: src/KSPACE/msm.cpp, Hardy
et al., Parallel Computing 35 (2009) 164-177). The reference evaluates, at
each grid level n, a "direct" part — a hemisphere stencil sweep of the
softened-kernel difference gamma(r/2^n a)/2^n a − gamma(r/2^{n+1} a)/2^{n+1}a
over ghost-extended bricks (msm.cpp:1533 direct) — plus polynomial
restriction/prolongation between levels (msm.cpp:2250,2321) and order-p
interpolation of charges/fields at the finest level (make_rho :1481,
fieldforce :2706).

TPU-first differences (mathematically identical):

  - The per-level direct sum with periodic wrap IS a circular convolution
    (the reference's ghost mapping is ``index & (N-1)``, msm.cpp:2462), so
    each level's stencil kernel is folded modulo the grid once at setup and
    applied as one rfftn/irfftn pair — no ghost cells, no hemisphere
    bookkeeping, and the level loop is a handful of tiny dense FFTs.
  - Forces are the EXACT gradient of the discrete multilevel energy
    (jax.grad through interpolation -> restriction chain -> convolutions):
    MSM is energy-conserving by construction (prolongation is the
    transpose of restriction, msm.cpp:2321), so this reproduces the
    reference's hand-coded dphi interpolation values.
  - The global virial uses the reference's 6 dgamma stencil kernels
    (get_virial_direct, msm.cpp:3167), folded the same way.

Setup (grid sizing from the accuracy target, kernel construction) runs on
the host in fp64 numpy, mirroring msm.cpp set_grid_global:950 and
get_g_direct:3106 exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from .pair_coul_misc import GCONS

Array = jax.Array


def _np_gamma(rho: np.ndarray, split_order: int) -> np.ndarray:
    """Splitting polynomial gamma(rho) in numpy fp64 (ref: kspace.h:147)."""
    c = GCONS[split_order]
    rho = np.asarray(rho, dtype=np.float64)
    rho2 = rho * rho
    g = np.full_like(rho, c[0])
    rho_n = rho2.copy()
    for n in range(1, split_order + 1):
        g += c[n] * rho_n
        rho_n *= rho2
    out = np.where(rho <= 1.0, g, np.divide(1.0, np.where(rho > 0, rho, 1.0)))
    return out


def _np_dgamma(rho: np.ndarray, split_order: int) -> np.ndarray:
    """dgamma(rho) in numpy fp64 (ref: kspace.h:168)."""
    from .pair_coul_misc import DGCONS

    c = DGCONS[split_order]
    rho = np.asarray(rho, dtype=np.float64)
    rho2 = rho * rho
    dg = c[0] * rho
    rho_n = rho * rho2
    for n in range(1, split_order):
        dg += c[n] * rho_n
        rho_n *= rho2
    return np.where(rho <= 1.0, dg,
                    -np.divide(1.0, np.where(rho > 0, rho2, 1.0)))


# ---------------------------------------------------------------------------
# order-p interpolating polynomial basis (ref: msm.cpp compute_phi:2908)

def compute_phi(xi, order: int):
    """Interpolating polynomial phi (Eq 7, Hardy 2009); traced,
    differentiable a.e.; exact mirror of msm.cpp:2908-2980."""
    ax = jnp.abs(xi)
    xi2 = xi * xi
    if order == 4:
        b1 = (1.0 - ax) * (1.0 + ax - 1.5 * xi2)
        b2 = -0.5 * (ax - 1.0) * (2.0 - ax) * (2.0 - ax)
        return jnp.where(ax <= 1, b1, jnp.where(ax <= 2, b2, 0.0))
    if order == 6:
        b1 = (1.0 - xi2) * (2.0 - ax) * (6.0 + 3.0 * ax - 5.0 * xi2) / 12.0
        b2 = -(ax - 1.0) * (2.0 - ax) * (3.0 - ax) * \
            (4.0 + 9.0 * ax - 5.0 * xi2) / 24.0
        b3 = (ax - 1.0) * (ax - 2.0) * (3.0 - ax) * (3.0 - ax) * \
            (4.0 - ax) / 24.0
        return jnp.where(ax <= 1, b1, jnp.where(ax <= 2, b2,
                         jnp.where(ax <= 3, b3, 0.0)))
    if order == 8:
        b1 = (1.0 - xi2) * (4.0 - xi2) * (3.0 - ax) * \
            (12.0 + 4.0 * ax - 7.0 * xi2) / 144.0
        b2 = -(xi2 - 1.0) * (2.0 - ax) * (3.0 - ax) * (4.0 - ax) * \
            (10.0 + 12.0 * ax - 7.0 * xi2) / 240.0
        b3 = (ax - 1.0) * (ax - 2.0) * (3.0 - ax) * (4.0 - ax) * \
            (5.0 - ax) * (6.0 + 20.0 * ax - 7.0 * xi2) / 720.0
        b4 = -(ax - 1.0) * (ax - 2.0) * (ax - 3.0) * (4.0 - ax) * \
            (4.0 - ax) * (5.0 - ax) * (6.0 - ax) / 720.0
        return jnp.where(ax <= 1, b1, jnp.where(ax <= 2, b2,
                         jnp.where(ax <= 3, b3, jnp.where(ax <= 4, b4,
                                                          0.0))))
    if order == 10:
        b1 = (1.0 - xi2) * (4.0 - xi2) * (9.0 - xi2) * (4.0 - ax) * \
            (20.0 + 5.0 * ax - 9.0 * xi2) / 2880.0
        b2 = -(xi2 - 1.0) * (4.0 - xi2) * (3.0 - ax) * (4.0 - ax) * \
            (5.0 - ax) * (6.0 + 5.0 * ax - 3.0 * xi2) / 1440.0
        b3 = (xi2 - 1.0) * (ax - 2.0) * (3.0 - ax) * (4.0 - ax) * \
            (5.0 - ax) * (6.0 - ax) * (14.0 + 25.0 * ax - 9.0 * xi2) / \
            10080.0
        b4 = -(ax - 1.0) * (ax - 2.0) * (ax - 3.0) * (4.0 - ax) * \
            (5.0 - ax) * (6.0 - ax) * (7.0 - ax) * \
            (8.0 + 35.0 * ax - 9.0 * xi2) / 40320.0
        b5 = (ax - 1.0) * (ax - 2.0) * (ax - 3.0) * (ax - 4.0) * \
            (5.0 - ax) * (5.0 - ax) * (6.0 - ax) * (7.0 - ax) * \
            (8.0 - ax) / 40320.0
        return jnp.where(ax <= 1, b1, jnp.where(ax <= 2, b2,
                         jnp.where(ax <= 3, b3, jnp.where(ax <= 4, b4,
                         jnp.where(ax <= 5, b5, 0.0)))))
    raise ValueError(f"MSM order must be 4, 6, 8, or 10, got {order}")


def _np_phi(xi: np.ndarray, order: int) -> np.ndarray:
    """Host-side phi for restriction weights (exact same polynomials)."""
    return np.asarray(jax.device_get(
        compute_phi(jnp.asarray(xi, dtype=jnp.float64), order)))


# ---------------------------------------------------------------------------
# grid sizing (ref: msm.cpp set_grid_global:950, estimate_1d_error:202)

_MP = {3: 9.0, 5: 825.0, 7: 130095.0, 9: 34096545.0}
_CPRIME = {3: 1.0 / 6.0, 5: 1.0 / 30.0, 7: 1.0 / 140.0, 9: 1.0 / 630.0}
_ERR_SCALE = {3: 0.39189561, 5: 0.150829428, 7: 0.049632967,
              9: 0.013520855}


def _estimate_1d_error(h: float, prd: float, cutoff: float, order: int,
                       q2: float, natoms: int) -> float:
    p = order - 1
    c_p = 4.0 * _CPRIME[p] * _MP[p] / 3.0 * _ERR_SCALE[p]
    err = c_p * h ** (p - 1) / cutoff ** (p + 1)
    return err * q2 * cutoff / (prd * np.sqrt(float(natoms)))


def _size_axis(prd: float, cutoff: float, order: int, q2: float,
               natoms: int, accuracy: float) -> int:
    n = 2
    err = 2.0 * accuracy
    while err > accuracy:
        n *= 2
        err = _estimate_1d_error(prd / n, prd, cutoff, order, q2, natoms)
    return n


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MSM:
    """Multilevel summation kspace solver (periodic orthogonal boxes).

    ``gfold[n]``/``vfold[n]`` are the level-n direct-interaction stencils
    (ref: get_g_direct msm.cpp:3106) pre-folded modulo the level grid, so
    the per-level direct sum is one circular convolution.
    """

    gfold: tuple          # per level: [nz, ny, nx] folded energy kernel
    vfold: tuple          # per level: [6, nz, ny, nx] folded virial kernels
    boxlo: Array          # (3,)
    delinv0: Array        # (3,) finest-level grid points per unit length
    qqrd2e: float = dataclasses.field(metadata=dict(static=True))
    cutoff: float = dataclasses.field(metadata=dict(static=True))
    order: int = dataclasses.field(metadata=dict(static=True))
    levels: int = dataclasses.field(metadata=dict(static=True))
    grids: tuple = dataclasses.field(metadata=dict(static=True))
    scalar_pressure: bool = dataclasses.field(
        default=True, metadata=dict(static=True))

    # -- setup ---------------------------------------------------------

    @staticmethod
    def create(box, cutoff: float, accuracy_rel: float, natoms: int,
               qsqsum: float, qqrd2e: float, order: int = 10,
               grid=None, scalar_pressure: bool = True,
               dtype=jnp.float64) -> "MSM":
        """Mirror of MSM::init + set_grid_global + setup (msm.cpp:123,
        950,290) for periodic orthogonal boxes; all host-side fp64."""
        prd = np.asarray(jax.device_get(box.prd), dtype=np.float64)
        lo = np.asarray(jax.device_get(box.lo), dtype=np.float64)
        q2 = qsqsum * qqrd2e
        # accuracy (force units) = rel * force between two unit point
        # charges 1 Angstrom apart (ref: kspace.cpp two_charge)
        accuracy = accuracy_rel * qqrd2e

        if grid is None:
            nmax = [_size_axis(prd[d], cutoff, order, q2, natoms, accuracy)
                    for d in range(3)]
        else:
            nmax = list(grid)
            for n in nmax:
                if n & (n - 1):
                    raise ValueError("MSM grid must be powers of 2")
        axlv = [int(np.log2(n)) + 1 for n in nmax]
        levels = max(max(axlv), 2)
        levels -= 1  # periodic: omit top grid level (msm.cpp:1114)

        grids = []
        for n in range(levels):
            g = tuple(
                int(2.0 ** (axlv[d] - n - 1)) if axlv[d] - n - 1 > 0 else 1
                for d in range(3))
            grids.append(g)
        grids = tuple(grids)

        # direct-sum index range from the FINEST level spacing
        # (msm.cpp:341-346); the same index range applies at every level
        delinv0 = np.array([grids[0][d] / prd[d] for d in range(3)])
        ndir = [int(2.0 * cutoff * delinv0[d]) for d in range(3)]

        so = order // 2
        gfold, vfold = [], []
        ix = np.arange(-ndir[0], ndir[0] + 1)
        iy = np.arange(-ndir[1], ndir[1] + 1)
        iz = np.arange(-ndir[2], ndir[2] + 1)
        for n in range(levels):
            dinv = [grids[n][d] / prd[d] for d in range(3)]
            dx = ix / dinv[0]
            dy = iy / dinv[1]
            dz = iz / dinv[2]
            DX, DY, DZ = np.meshgrid(dx, dy, dz, indexing="ij")
            r = np.sqrt(DX * DX + DY * DY + DZ * DZ)
            two_n = 2.0 ** n
            rho = r / (two_n * cutoff)
            g = (_np_gamma(rho, so) / (two_n * cutoff)
                 - _np_gamma(rho / 2.0, so) / (2.0 * two_n * cutoff))
            # virial kernels dg * d_a d_b (get_virial_direct:3167)
            with np.errstate(divide="ignore", invalid="ignore"):
                dg = -(_np_dgamma(rho, so) / (two_n * two_n
                                              * cutoff * cutoff)
                       - _np_dgamma(rho / 2.0, so)
                       / (4.0 * two_n * two_n * cutoff * cutoff)) / r
            dg = np.where(r == 0.0, 0.0, dg)
            v6 = np.stack([dg * DX * DX, dg * DY * DY, dg * DZ * DZ,
                           dg * DX * DY, dg * DX * DZ, dg * DY * DZ])
            # fold modulo the level grid: periodic ghost mapping is
            # index & (N-1) (msm.cpp:2462), i.e. circular wrap
            nz, ny, nx = grids[n][2], grids[n][1], grids[n][0]
            gf = np.zeros((nz, ny, nx))
            vf = np.zeros((6, nz, ny, nx))
            np.add.at(gf, (iz[:, None, None] % nz, iy[None, :, None] % ny,
                           ix[None, None, :] % nx),
                      np.transpose(g, (2, 1, 0)))
            for k in range(6):
                np.add.at(vf[k], (iz[:, None, None] % nz,
                                  iy[None, :, None] % ny,
                                  ix[None, None, :] % nx),
                          np.transpose(v6[k], (2, 1, 0)))
            gfold.append(jnp.asarray(gf, dtype=jnp.float64))
            vfold.append(jnp.asarray(vf, dtype=jnp.float64))

        return MSM(gfold=tuple(gfold), vfold=tuple(vfold),
                   boxlo=jnp.asarray(lo, dtype=dtype),
                   delinv0=jnp.asarray(delinv0, dtype=dtype),
                   qqrd2e=float(qqrd2e), cutoff=float(cutoff),
                   order=int(order), levels=int(levels), grids=grids,
                   scalar_pressure=bool(scalar_pressure))

    # -- interpolation (anterpolation) -----------------------------------

    def _stencil(self, x: Array):
        """Per-atom stencil grid indices + phi weights along each axis.

        (nx,ny,nz) = floor point; weights phi(dx + nu), nu in
        [nlower, nupper] (ref: particle_map:1441, compute_phis:2864)."""
        order = self.order
        nlower = -(order - 1) // 2
        nupper = order // 2
        xf = (x - self.boxlo[None, :]) * self.delinv0[None, :]
        n0 = jnp.floor(xf)
        d = n0 - xf                                    # in (-1, 0]
        nu = jnp.arange(nlower, nupper + 1, dtype=x.dtype)
        # [N, K, 3] phi weights; gradient flows through d only
        w = compute_phi(d[:, None, :] + nu[None, :, None], order)
        idx = (jax.lax.stop_gradient(n0[:, None, :]).astype(jnp.int32)
               + nu[None, :, None].astype(jnp.int32))
        return idx, w

    def _anterpolate(self, x: Array, q: Array) -> Array:
        """Spread charges onto the finest grid with periodic wrap
        (make_rho, msm.cpp:1481)."""
        nx, ny, nz = self.grids[0]
        idx, w = self._stencil(x)
        K = w.shape[1]
        wx = w[:, :, 0][:, :, None, None]
        wy = w[:, :, 1][:, None, :, None]
        wz = w[:, :, 2][:, None, None, :]
        val = (q[:, None, None, None] * wx * wy * wz).reshape(-1)
        gx = idx[:, :, 0] % nx
        gy = idx[:, :, 1] % ny
        gz = idx[:, :, 2] % nz
        fz = jnp.broadcast_to(gz[:, None, None, :], (x.shape[0], K, K, K))
        fy = jnp.broadcast_to(gy[:, None, :, None], (x.shape[0], K, K, K))
        fx = jnp.broadcast_to(gx[:, :, None, None], (x.shape[0], K, K, K))
        grid = jnp.zeros((nz, ny, nx), dtype=x.dtype)
        return grid.at[fz.reshape(-1), fy.reshape(-1),
                       fx.reshape(-1)].add(val)

    def _restrict(self, qn: Array, n: int) -> Array:
        """Level n -> n+1 charge restriction (msm.cpp:2250): separable
        per-axis gather with phi(nu * ratio) weights at the odd offsets."""
        p = self.order - 1
        out = qn
        # axes of qn are (z, y, x) = grid dims reversed
        for ax, d in ((0, 2), (1, 1), (2, 0)):
            nf = self.grids[n][d]
            nc = self.grids[n + 1][d]
            ratio = nc / nf            # 1/2, or 1 when the axis is exhausted
            nus = np.array([v for v in range(-p, p + 1)
                            if v % 2 != 0 or v == 0])
            wts = _np_phi(nus * ratio, self.order)
            keep = np.abs(wts) > 0.0
            nus, wts = nus[keep], wts[keep]
            stride = nf // nc
            base = np.arange(nc) * stride
            gather = (base[:, None] + nus[None, :]) % nf      # [nc, K]
            gi = jnp.asarray(gather.reshape(-1), dtype=jnp.int32)
            wt = jnp.asarray(wts, dtype=qn.dtype)
            taken = jnp.take(out, gi, axis=ax)
            shp = list(taken.shape)
            shp[ax:ax + 1] = [nc, len(nus)]
            taken = taken.reshape(shp)
            # contracting axis ax+1 keeps nc at position ax
            out = jnp.tensordot(taken, wt, axes=([ax + 1], [0]))
        return out

    # -- energy / compute -------------------------------------------------

    def _level_charges(self, x: Array, q: Array):
        qs = [self._anterpolate(x, q)]
        for n in range(self.levels - 1):
            qs.append(self._restrict(qs[n], n))
        return qs

    def _mesh_energy(self, x: Array, q: Array) -> Array:
        """Sum over levels of q_n . (K_n * q_n): the reference accumulates
        exactly this inside direct(n) (msm.cpp:1736 'energy += 2*esum*qtmp'
        over the hemisphere == the full symmetric sum)."""
        e = 0.0
        for n, qn in enumerate(self._level_charges(x, q)):
            en = jnp.fft.irfftn(jnp.fft.rfftn(qn)
                                * jnp.fft.rfftn(self.gfold[n]),
                                s=qn.shape)
            e = e + jnp.vdot(qn, en)
        return e

    def compute(self, state: State, eflag: bool, vflag: bool):
        """(forces[N,3], energy, virial[6]) — the kspace contribution."""
        q = jnp.where(state.valid_mask, state.q, 0.0)
        x = state.x

        def energy_of(xx):
            return self._mesh_energy(xx, q)

        e_mesh, negf = jax.value_and_grad(energy_of)(x)
        qscale = self.qqrd2e
        # self-energy (msm.cpp:546): qsqsum * gamma(0) / cutoff
        gamma0 = float(GCONS[self.order // 2][0])
        qsqsum = jnp.sum(q * q)
        energy = 0.5 * qscale * (e_mesh - qsqsum * gamma0 / self.cutoff)
        forces = -0.5 * qscale * negf
        forces = jnp.where(state.valid_mask[:, None], forces, 0.0)

        if vflag and not self.scalar_pressure:
            qs = self._level_charges(x, q)
            vir = []
            for k in range(6):
                vk = 0.0
                for n, qn in enumerate(qs):
                    vn = jnp.fft.irfftn(jnp.fft.rfftn(qn)
                                        * jnp.fft.rfftn(self.vfold[n][k]),
                                        s=qn.shape)
                    vk = vk + jnp.vdot(qn, vn)
                vir.append(0.5 * qscale * vk)
            virial = jnp.stack(vir)
        else:
            # kspace_modify pressure/scalar yes (default): isotropic
            # virial from the energy (msm.cpp:558)
            virial = jnp.concatenate([jnp.full((3,), energy / 3.0),
                                      jnp.zeros((3,))])
        return forces, energy, virial
