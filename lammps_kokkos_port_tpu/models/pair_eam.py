"""Pair style eam / eam/alloy / eam/fs: embedded-atom many-body potential.

TPU-native re-implementation of the reference EAM
(ref: src/MANYBODY/pair_eam.cpp:142-330 compute, :533-720 file2array,
:769-799 interpolate; Kokkos twin src/KOKKOS/pair_eam_kokkos.cpp). The
reference's three phases map to one fused jit graph over FULL neighbor
lists with Newton off:

  KernelA: rho_i   = sum_j rhor(type_j -> i, r_ij)      (density)
  KernelB: fp_i    = F'(rho_i), E_embed = F(rho_i)       (embedding)
  KernelC: force   = -(fp_i rho'_j + fp_j rho'_i + phi') rhat  (pair pass)

On one chip the reference's mid-compute ghost comms (reverse rho, forward
fp — pair_eam.cpp:224,251) vanish: the full list recomputes both sides.
Tables are 7-coefficient cubic-spline rows on uniform grids, identical
layout to the reference ([n+1, 7], 1-based rows; SURVEY.md §A.5), stored as
dense device arrays gathered per pair.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.eam_reader import Funcfl, Setfl, read_funcfl, read_setfl
from .pair import gather_pairs, tally_virial

Array = jax.Array


def _interpolate(n: int, delta: float, f: np.ndarray) -> np.ndarray:
    """Build the 7-coeff spline table (ref: PairEAM::interpolate).

    f: [n] values (0-based input); returns [n+1, 7] with rows 1..n used,
    matching the reference's 1-based indexing exactly.
    """
    sp = np.zeros((n + 1, 7))
    sp[1:, 6] = f

    sp[1, 5] = sp[2, 6] - sp[1, 6]
    sp[2, 5] = 0.5 * (sp[3, 6] - sp[1, 6])
    sp[n - 1, 5] = 0.5 * (sp[n, 6] - sp[n - 2, 6])
    sp[n, 5] = sp[n, 6] - sp[n - 1, 6]
    m = np.arange(3, n - 1)
    sp[m, 5] = ((sp[m - 2, 6] - sp[m + 2, 6]) + 8.0 * (sp[m + 1, 6] - sp[m - 1, 6])) / 12.0

    m = np.arange(1, n)
    sp[m, 4] = 3.0 * (sp[m + 1, 6] - sp[m, 6]) - 2.0 * sp[m, 5] - sp[m + 1, 5]
    sp[m, 3] = sp[m, 5] + sp[m + 1, 5] - 2.0 * (sp[m + 1, 6] - sp[m, 6])
    sp[n, 4] = 0.0
    sp[n, 3] = 0.0

    sp[1:, 2] = sp[1:, 5] / delta
    sp[1:, 1] = 2.0 * sp[1:, 4] / delta
    sp[1:, 0] = 3.0 * sp[1:, 3] / delta
    return sp


def _lagrange_resample(src: np.ndarray, src_delta: float, n_out: int,
                       out_delta: float) -> np.ndarray:
    """4-point Lagrange resample onto a common grid (ref: file2array).

    src: [n_src] 0-based values; returns [n_out] values at r = (m-1)*out_delta
    for m=1..n_out, using the reference's clamped-index cubic interpolation.
    """
    n_src = len(src)
    # 1-based view
    s = np.concatenate([[0.0], src])
    m = np.arange(1, n_out + 1)
    r = (m - 1) * out_delta
    p = r / src_delta + 1.0
    k = np.floor(p).astype(int)
    k = np.minimum(k, n_src - 2)
    k = np.maximum(k, 2)
    p = np.minimum(p - k, 2.0)
    sixth = 1.0 / 6.0
    cof1 = -sixth * p * (p - 1.0) * (p - 2.0)
    cof2 = 0.5 * (p * p - 1.0) * (p - 2.0)
    cof3 = -0.5 * p * (p + 1.0) * (p - 2.0)
    cof4 = sixth * p * (p * p - 1.0)
    return cof1 * s[k - 1] + cof2 * s[k] + cof3 * s[k + 1] + cof4 * s[k + 2]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "frho_spline", "rhor_spline", "z2r_spline",
        "type2frho", "type2rhor", "type2z2r", "cutsq",
    ],
    meta_fields=["ntypes", "nrho", "nr", "drho", "dr", "rhomax", "cutmax"],
)
@dataclasses.dataclass(frozen=True)
class PairEAM:
    frho_spline: Array  # [nfrho, nrho+1, 7]
    rhor_spline: Array  # [nrhor, nr+1, 7]
    z2r_spline: Array  # [nz2r, nr+1, 7]
    type2frho: Array  # [ntypes+1] int32
    type2rhor: Array  # [ntypes+1, ntypes+1] int32
    type2z2r: Array  # [ntypes+1, ntypes+1] int32
    cutsq: Array  # [ntypes+1, ntypes+1]
    ntypes: int
    nrho: int
    nr: int
    drho: float
    dr: float
    rhomax: float
    cutmax: float

    # -- PairStyle interface -------------------------------------------------

    def cutsq_table(self) -> Array:
        return self.cutsq

    def max_cutoff(self) -> float:
        return self.cutmax

    @property
    def dense_two_pass(self) -> bool:
        """Single-element styles take the gather-free dense path
        (ops/eamdense: Chebyshev-resampled tables + grid rolls)."""
        return self.ntypes == 1

    def _r_index(self, r):
        """(m, frac) for the r-grid, 1-based (ref: p = r*rdr + 1)."""
        p = r * (1.0 / self.dr) + 1.0
        m = jnp.clip(jnp.floor(p).astype(jnp.int32), 1, self.nr - 1)
        frac = jnp.minimum(p - m.astype(p.dtype), 1.0)
        return m, frac

    def _rho_index(self, rho):
        p = rho * (1.0 / self.drho) + 1.0
        m = jnp.clip(jnp.floor(p).astype(jnp.int32), 1, self.nrho - 1)
        frac = jnp.minimum(p - m.astype(p.dtype), 1.0)
        return m, frac

    @staticmethod
    def _value(coeff, p):
        """((c3 p + c4) p + c5) p + c6"""
        return ((coeff[..., 3] * p + coeff[..., 4]) * p + coeff[..., 5]) * p + coeff[..., 6]

    @staticmethod
    def _deriv(coeff, p):
        """(c0 p + c1) p + c2"""
        return (coeff[..., 0] * p + coeff[..., 1]) * p + coeff[..., 2]

    def compute(self, state, nl, eflag: bool, vflag: bool):
        j, jc, pair_valid, dx, r2 = gather_pairs(state, nl)
        single = self.ntypes == 1

        if single:
            cutsq = self.cutsq[1, 1]
        else:
            ti = state.type[:, None]
            tj = state.type[jc]
            cutsq = self.cutsq[ti, tj]
        valid = pair_valid & (r2 < cutsq)
        r = jnp.sqrt(jnp.where(valid, r2, 1.0))
        m, p = self._r_index(r)

        # --- density pass (KernelA) ---
        if single:
            rho_coeff_ji = self.rhor_spline[self.type2rhor[1, 1], m]  # [cap, K, 7]
        else:
            rho_coeff_ji = self.rhor_spline[self.type2rhor[tj, ti], m]
        rho_contrib = jnp.where(valid, self._value(rho_coeff_ji, p), 0.0)
        rho = jnp.sum(rho_contrib, axis=1)  # [cap]

        # --- embedding pass (KernelB) ---
        mr, q = self._rho_index(rho)
        if single:
            fcoeff = self.frho_spline[self.type2frho[1], mr]
        else:
            fcoeff = self.frho_spline[self.type2frho[state.type], mr]
        fp = self._deriv(fcoeff, q)  # F'(rho_i)
        fp = jnp.where(state.valid_mask, fp, 0.0)

        pe = None
        if eflag:
            phi_embed = self._value(fcoeff, q)
            # beyond-table linear extension (ref: pair_eam.cpp:232-238)
            phi_embed = phi_embed + jnp.where(
                rho > self.rhomax, fp * (rho - self.rhomax), 0.0
            )
            e_embed = jnp.sum(jnp.where(state.owned_mask, phi_embed, 0.0))

        # --- force pass (KernelC) ---
        if single:
            rhoip_coeff = rho_coeff_ji
            rhojp_coeff = rho_coeff_ji
            z2_coeff = self.z2r_spline[self.type2z2r[1, 1], m]
        else:
            rhoip_coeff = self.rhor_spline[self.type2rhor[ti, tj], m]
            rhojp_coeff = rho_coeff_ji
            z2_coeff = self.z2r_spline[self.type2z2r[ti, tj], m]

        rhoip = self._deriv(rhoip_coeff, p)  # d/dr rho of i's element
        rhojp = self._deriv(rhojp_coeff, p)
        z2p = self._deriv(z2_coeff, p)
        z2 = self._value(z2_coeff, p)

        recip = 1.0 / r
        phi = z2 * recip
        phip = z2p * recip - phi * recip
        psip = fp[:, None] * rhojp + fp[jc] * rhoip + phip
        fpair = jnp.where(valid, -psip * recip, 0.0)

        f = jnp.sum(dx * fpair[..., None], axis=1)

        owned = state.owned_mask[:, None]
        if eflag:
            e_pair = 0.5 * jnp.sum(jnp.where(valid & owned, phi, 0.0))
            pe = e_embed + e_pair

        virial = (tally_virial(jnp.where(owned, fpair, 0.0), dx)
                  if vflag else None)
        return f, pe, virial


def make_eam_funcfl(
    ntypes: int,
    files: dict[int, str | Funcfl],
    dtype=jnp.float64,
) -> PairEAM:
    """`pair_style eam` + per-type `pair_coeff i i file` (funcfl).

    files maps 1-based type -> funcfl path (or parsed Funcfl). Mixing between
    elements follows the reference: z2r_ij = 27.2*0.529 * Z_i(r) Z_j(r)
    (ref: file2array).
    """
    parsed: list[Funcfl] = []
    keys = {}
    for t in range(1, ntypes + 1):
        if t not in files:
            raise ValueError(f"no EAM funcfl file for type {t}")
        f = files[t]
        key = f if isinstance(f, str) else id(f)
        if key not in keys:
            keys[key] = len(parsed)
            parsed.append(read_funcfl(f) if isinstance(f, str) else f)
    type_map = np.array(
        [0] + [keys[files[t] if isinstance(files[t], str) else id(files[t])]
               for t in range(1, ntypes + 1)],
        dtype=np.int32,
    )
    nfiles = len(parsed)

    # common grid (ref: file2array): max spacings, counts from max extents
    dr = max(f.dr for f in parsed)
    drho = max(f.drho for f in parsed)
    rmax = max((f.nr - 1) * f.dr for f in parsed)
    rhomax = max((f.nrho - 1) * f.drho for f in parsed)
    nr = int(rmax / dr + 0.5)
    nrho = int(rhomax / drho + 0.5)

    frho = np.zeros((nfiles + 1, nrho))  # extra zero row for non-EAM types
    rhor = np.zeros((nfiles, nr))
    for i, f in enumerate(parsed):
        frho[i] = _lagrange_resample(f.frho, f.drho, nrho, drho)
        rhor[i] = _lagrange_resample(f.rhor, f.dr, nr, dr)

    nz2r = nfiles * (nfiles + 1) // 2
    z2r = np.zeros((nz2r, nr))
    n = 0
    zr_res = [_lagrange_resample(f.zr, f.dr, nr, dr) for f in parsed]
    for i in range(nfiles):
        for jj in range(i + 1):
            z2r[n] = 27.2 * 0.529 * zr_res[i] * zr_res[jj]
            n += 1

    # type maps (ref: file2array type2frho/type2rhor/type2z2r)
    type2frho = type_map.copy()
    type2rhor = np.zeros((ntypes + 1, ntypes + 1), dtype=np.int32)
    type2z2r = np.zeros((ntypes + 1, ntypes + 1), dtype=np.int32)
    for i in range(1, ntypes + 1):
        for jt in range(1, ntypes + 1):
            type2rhor[i, jt] = type_map[i]
            irow, icol = type_map[i], type_map[jt]
            if irow < icol:
                irow, icol = icol, irow
            type2z2r[i, jt] = irow * (irow + 1) // 2 + icol

    cutmax = max(f.cut for f in parsed)
    cutsq = np.full((ntypes + 1, ntypes + 1), cutmax * cutmax)

    return _finalize_eam(
        ntypes, nrho, nr, drho, dr, rhomax, cutmax, cutsq,
        frho, rhor, z2r, type2frho, type2rhor, type2z2r, dtype,
    )


def make_eam_setfl(
    ntypes: int,
    path: str | Setfl,
    type_elements: list[str] | None = None,
    fs: bool = False,
    dtype=jnp.float64,
) -> PairEAM:
    """`pair_style eam/alloy` (or eam/fs) + `pair_coeff * * file El1 El2 ...`.

    type_elements: element name per 1-based type (defaults to file order).
    """
    st = read_setfl(path, fs=fs) if isinstance(path, str) else path
    nelem = len(st.elements)
    if type_elements is None:
        if ntypes != nelem:
            raise ValueError("type_elements required when ntypes != nelements")
        emap = list(range(nelem))
    else:
        emap = [st.elements.index(e) for e in type_elements]

    nrho, nr = st.nrho, st.nr
    frho = np.concatenate([st.frho, np.zeros((1, nrho))], axis=0)

    if fs:
        # rho_{alpha,beta}: density of alpha's field seen by beta; indexed by
        # pair -> flatten [nelem*nelem, nr], type2rhor[i][j] = emap[j]... see
        # reference pair_eam_fs.cpp: type2rhor[i][j] = i-element row of j
        rhor = st.rhor.reshape(nelem * nelem, nr)
    else:
        rhor = st.rhor

    nz2r = nelem * (nelem + 1) // 2
    z2r = np.zeros((nz2r, nr))
    n = 0
    for i in range(nelem):
        for jj in range(i + 1):
            z2r[n] = st.z2r[i, jj]
            n += 1

    type2frho = np.array([nelem] + [emap[t - 1] for t in range(1, ntypes + 1)],
                         dtype=np.int32)
    type2frho[0] = nelem  # zero row
    type2rhor = np.zeros((ntypes + 1, ntypes + 1), dtype=np.int32)
    type2z2r = np.zeros((ntypes + 1, ntypes + 1), dtype=np.int32)
    for i in range(1, ntypes + 1):
        for jt in range(1, ntypes + 1):
            if fs:
                # rho contribution TO atom of type jt FROM atom of type i:
                # row (emap[i], emap[jt]) of the [nelem, nelem] matrix
                type2rhor[i, jt] = emap[i - 1] * nelem + emap[jt - 1]
            else:
                type2rhor[i, jt] = emap[i - 1]
            irow, icol = emap[i - 1], emap[jt - 1]
            if irow < icol:
                irow, icol = icol, irow
            type2z2r[i, jt] = irow * (irow + 1) // 2 + icol

    rhomax = (nrho - 1) * st.drho
    cutmax = st.cut
    cutsq = np.full((ntypes + 1, ntypes + 1), cutmax * cutmax)

    return _finalize_eam(
        ntypes, nrho, nr, st.drho, st.dr, rhomax, cutmax, cutsq,
        frho, rhor, z2r, type2frho, type2rhor, type2z2r, dtype,
    )


def _finalize_eam(
    ntypes, nrho, nr, drho, dr, rhomax, cutmax, cutsq,
    frho, rhor, z2r, type2frho, type2rhor, type2z2r, dtype,
) -> PairEAM:
    frho_spline = np.stack([_interpolate(nrho, drho, t) for t in frho])
    rhor_spline = np.stack([_interpolate(nr, dr, t) for t in rhor])
    z2r_spline = np.stack([_interpolate(nr, dr, t) for t in z2r])
    return PairEAM(
        frho_spline=jnp.asarray(frho_spline, dtype=dtype),
        rhor_spline=jnp.asarray(rhor_spline, dtype=dtype),
        z2r_spline=jnp.asarray(z2r_spline, dtype=dtype),
        type2frho=jnp.asarray(type2frho),
        type2rhor=jnp.asarray(type2rhor),
        type2z2r=jnp.asarray(type2z2r),
        cutsq=jnp.asarray(cutsq, dtype=dtype),
        ntypes=ntypes,
        nrho=nrho,
        nr=nr,
        drho=float(drho),
        dr=float(dr),
        rhomax=float(rhomax),
        cutmax=float(cutmax),
    )
