"""Pair style snap: SNAP machine-learned bispectrum potential.

TPU-native re-design of the reference SNAP
(ref: src/ML-SNAP/pair_snap.cpp:86-245, sna.cpp — build_indexlist :223-273,
init_clebsch_gordan, compute_uarray :VMK 4.8.2 recursion, compute_zi
:381-450, compute_bi; Kokkos twin src/KOKKOS/pair_snap_kokkos_impl.h whose
atom-chunked multi-kernel pipeline this mirrors with lax.map chunks).

Key re-design vs the reference:
  - The Wigner-U recursion is vectorized over all pairs at once per j level
    (the reference's per-neighbor scalar recursion), with the half-matrix
    symmetry fill done as a flip+conjugate+parity tensor op.
  - The CG contractions (zi + bi) are FLATTENED ON THE HOST into one sparse
    trilinear table: B_b = sum_t w_t Re[U_{k1} U_{k2} conj(U_{k3})], built
    by replaying the reference's exact loop nests symbolically — device
    code is three gathers, a complex multiply, and a segment-sum.
  - Forces are the exact jax.grad of the total energy — the entire adjoint
    pipeline (compute_yi/duidrj/deidrj, ~1500 lines in the reference)
    disappears; the virial is a strain derivative.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Host-side index/coefficient machinery (exact reference semantics)
# ---------------------------------------------------------------------------


def _factorial(n: int) -> float:
    return float(math.factorial(n))


def _deltacg(j1, j2, j):
    s = _factorial((j1 + j2 + j) // 2 + 1)
    return math.sqrt(
        _factorial((j1 + j2 - j) // 2) * _factorial((j1 - j2 + j) // 2)
        * _factorial((-j1 + j2 + j) // 2) / s
    )


def _build_cglist(twojmax):
    """cglist + idxcg_block (ref: SNA::init_clebsch_gordan)."""
    idxcg_block = {}
    cg = []
    count = 0
    for j1 in range(twojmax + 1):
        for j2 in range(j1 + 1):
            for j in range(j1 - j2, min(twojmax, j1 + j2) + 1, 2):
                idxcg_block[(j1, j2, j)] = count
                for m1 in range(j1 + 1):
                    aa2 = 2 * m1 - j1
                    for m2 in range(j2 + 1):
                        bb2 = 2 * m2 - j2
                        m = (aa2 + bb2 + j) // 2
                        if m < 0 or m > j:
                            cg.append(0.0)
                            count += 1
                            continue
                        total = 0.0
                        zmin = max(0, max(-(j - j2 + aa2) // 2,
                                          -(j - j1 - bb2) // 2))
                        zmax = min((j1 + j2 - j) // 2,
                                   min((j1 - aa2) // 2, (j2 + bb2) // 2))
                        for z in range(zmin, zmax + 1):
                            ifac = -1.0 if z % 2 else 1.0
                            total += ifac / (
                                _factorial(z)
                                * _factorial((j1 + j2 - j) // 2 - z)
                                * _factorial((j1 - aa2) // 2 - z)
                                * _factorial((j2 + bb2) // 2 - z)
                                * _factorial((j - j2 + aa2) // 2 + z)
                                * _factorial((j - j1 - bb2) // 2 + z)
                            )
                        cc2 = 2 * m - j
                        sfaccg = math.sqrt(
                            _factorial((j1 + aa2) // 2)
                            * _factorial((j1 - aa2) // 2)
                            * _factorial((j2 + bb2) // 2)
                            * _factorial((j2 - bb2) // 2)
                            * _factorial((j + cc2) // 2)
                            * _factorial((j - cc2) // 2)
                            * (j + 1)
                        )
                        cg.append(total * _deltacg(j1, j2, j) * sfaccg)
                        count += 1
    return np.asarray(cg), idxcg_block


def build_snap_tables(twojmax: int):
    """idxu blocks, B list, and the flattened trilinear COO table.

    Returns dict with idxu_block, idxu_max, idxb (list of (j1,j2,j)),
    triplets (u1, u2, u3, b, w) as numpy arrays.
    """
    idxu_block = []
    count = 0
    for j in range(twojmax + 1):
        idxu_block.append(count)
        count += (j + 1) * (j + 1)
    idxu_max = count

    idxb = []
    for j1 in range(twojmax + 1):
        for j2 in range(j1 + 1):
            for j in range(j1 - j2, min(twojmax, j1 + j2) + 1, 2):
                if j >= j1:
                    idxb.append((j1, j2, j))

    cglist, idxcg_block = _build_cglist(twojmax)

    t_u1, t_u2, t_u3, t_b, t_w = [], [], [], [], []
    for jjb, (j1, j2, j) in enumerate(idxb):
        cgoff = idxcg_block[(j1, j2, j)]
        for mb in range(j // 2 + 1):
            for ma in range(j + 1):
                # bi summation weights (ref: compute_bi half + middle column)
                if 2 * mb < j:
                    w_u = 2.0
                else:  # j even, middle row mb == j/2
                    if ma < mb:
                        w_u = 2.0
                    elif ma == mb:
                        w_u = 1.0  # 2 * 0.5
                    else:
                        continue
                ma1min = max(0, (2 * ma - j - j2 + j1) // 2)
                ma2max = (2 * ma - j - (2 * ma1min - j1) + j2) // 2
                na = min(j1, (2 * ma - j + j2 + j1) // 2) - ma1min + 1
                mb1min = max(0, (2 * mb - j - j2 + j1) // 2)
                mb2max = (2 * mb - j - (2 * mb1min - j1) + j2) // 2
                nb = min(j1, (2 * mb - j + j2 + j1) // 2) - mb1min + 1
                jju = idxu_block[j] + (j + 1) * mb + ma
                jju1 = idxu_block[j1] + (j1 + 1) * mb1min
                jju2 = idxu_block[j2] + (j2 + 1) * mb2max
                icgb = mb1min * (j2 + 1) + mb2max
                for ib in range(nb):
                    ma1 = ma1min
                    ma2 = ma2max
                    icga = ma1min * (j2 + 1) + ma2max
                    for ia in range(na):
                        w = w_u * cglist[cgoff + icgb] * cglist[cgoff + icga]
                        if w != 0.0:
                            t_u1.append(jju1 + ma1)
                            t_u2.append(jju2 + ma2)
                            t_u3.append(jju)
                            t_b.append(jjb)
                            t_w.append(w)
                        ma1 += 1
                        ma2 -= 1
                        icga += j2
                    jju1 += j1 + 1
                    jju2 -= j2 + 1
                    icgb += j2
    return {
        "idxu_block": idxu_block,
        "idxu_max": idxu_max,
        "idxb": idxb,
        "u1": np.asarray(t_u1, dtype=np.int32),
        "u2": np.asarray(t_u2, dtype=np.int32),
        "u3": np.asarray(t_u3, dtype=np.int32),
        "b": np.asarray(t_b, dtype=np.int32),
        "w": np.asarray(t_w),
    }


def read_snap_files(coeff_path: str, param_path: str):
    """Parse .snapcoeff + .snapparam (ref: PairSNAP::read_files)."""
    with open(coeff_path) as f:
        lines = [ln.split("#")[0].strip() for ln in f]
        lines = [ln for ln in lines if ln]
    nelem, ncoeffall = (int(t) for t in lines[0].split())
    elements = []
    radelem = []
    wjelem = []
    coeffs = []
    pos = 1
    for _ in range(nelem):
        name, rad, wj = lines[pos].split()
        elements.append(name)
        radelem.append(float(rad))
        wjelem.append(float(wj))
        pos += 1
        coeffs.append([float(lines[pos + k]) for k in range(ncoeffall)])
        pos += ncoeffall
    params = {"rfac0": 0.99363, "rmin0": 0.0, "switchflag": 1,
              "bzeroflag": 1, "quadraticflag": 0, "bnormflag": 0,
              "wselfallflag": 0, "chemflag": 0}
    with open(param_path) as f:
        for ln in f:
            ln = ln.split("#")[0].strip()
            if not ln:
                continue
            k, v = ln.split()[:2]
            params[k] = float(v) if "." in v or "e" in v.lower() else int(v)
    return {
        "elements": elements,
        "radelem": np.asarray(radelem),
        "wjelem": np.asarray(wjelem),
        "coeffs": np.asarray(coeffs),
        "ncoeffall": ncoeffall,
        **params,
    }


# ---------------------------------------------------------------------------
# Device pipeline
# ---------------------------------------------------------------------------

_DATA = ["coeff0", "beta", "quad", "radelem", "wjelem", "cutsq",
         "tu1", "tu2", "tu3", "tb", "tw", "bzero"]
_META = ["ntypes", "twojmax", "idxu_max", "idxb_max", "rcutfac", "rfac0",
         "rmin0", "switchflag", "bzeroflag", "quadraticflag", "cutmax",
         "idxu_block", "chunk"]


@partial(jax.tree_util.register_dataclass, data_fields=_DATA,
         meta_fields=_META)
@dataclasses.dataclass(frozen=True)
class PairSNAP:
    coeff0: Array  # [nt+1] per-type energy shift (coeff[0])
    beta: Array  # [nt+1, ncoeff] linear coefficients
    quad: Array  # [nt+1, ncoeff*(ncoeff+1)//2] or [nt+1, 0]
    radelem: Array  # [nt+1]
    wjelem: Array  # [nt+1]
    cutsq: Array  # [nt+1, nt+1]
    tu1: Array  # COO triplet tables
    tu2: Array
    tu3: Array
    tb: Array
    tw: Array
    bzero: Array  # [twojmax+1]
    ntypes: int
    twojmax: int
    idxu_max: int
    idxb_max: int
    rcutfac: float
    rfac0: float
    rmin0: float
    switchflag: int
    bzeroflag: int
    quadraticflag: int
    cutmax: float
    idxu_block: tuple
    chunk: int

    def cutsq_table(self) -> Array:
        return self.cutsq

    def max_cutoff(self) -> float:
        return self.cutmax

    # -- bispectrum of one atom-chunk ---------------------------------------

    def _ulist_levels(self, a, b):
        """Wigner U per j level, vectorized over pair dims.

        a, b: complex Cayley-Klein params, any shape S. Returns list over
        j = 0..twojmax of arrays S + (j+1, j+1) indexed [mb, ma]
        (ref: SNA::compute_uarray recursion + symmetry fill).
        """
        S = a.shape
        levels = [jnp.ones(S + (1, 1), dtype=a.dtype)]
        for j in range(1, self.twojmax + 1):
            prev = levels[j - 1]  # S + (j, j)
            nmb_half = j // 2 + 1
            # c1[mb, ma] = sqrt((j-ma)/(j-mb)); c2[mb, ma] = sqrt(ma/(j-mb))
            ma_idx = np.arange(j + 1)
            mb_idx = np.arange(nmb_half)
            c1 = np.sqrt(
                (j - ma_idx)[None, :] / (j - mb_idx)[:, None]
            )
            c2 = np.sqrt(ma_idx[None, :] / (j - mb_idx)[:, None])
            c1 = jnp.asarray(c1, dtype=jnp.float64 if a.dtype == jnp.complex128
                             else jnp.float32)
            c2 = jnp.asarray(c2, dtype=c1.dtype)
            # u_prev rows for mb in [0, nmb_half): S + (nmb_half, j)
            up = prev[..., :nmb_half, :]
            zero = jnp.zeros(S + (nmb_half, 1), dtype=a.dtype)
            up_pad = jnp.concatenate([up, zero], axis=-1)  # ma = 0..j
            up_shift = jnp.concatenate([zero, up], axis=-1)  # ma-1
            anew = jnp.conj(a)[..., None, None]
            bnew = jnp.conj(b)[..., None, None]
            half = c1 * anew * up_pad - c2 * bnew * up_shift
            # right half via symmetry: u[j-mb, j-ma] = (-1)^(ma+mb) conj(u)
            nmb_rest = j + 1 - nmb_half
            sign = jnp.asarray(
                ((-1.0) ** (ma_idx[None, :] + mb_idx[:, None])), dtype=c1.dtype
            )
            mirrored = (sign * jnp.conj(half))[..., ::-1, ::-1]
            rest = mirrored[..., -nmb_rest:, :] if nmb_rest else half[..., :0, :]
            # rows of `rest` correspond to mb = j..(j-nmb_rest+1) reversed ->
            # after the flip they are mb = nmb_half..j in order
            full = jnp.concatenate([half, rest], axis=-2)
            levels.append(full)
        return levels

    def _bispectrum(self, dx, r2, valid, ti, tj):
        """B [C, idxb_max] from chunk displacements dx [C,K,3]."""
        dt = dx.dtype
        cdtype = jnp.complex128 if dt == jnp.float64 else jnp.complex64
        r = jnp.sqrt(jnp.where(valid, r2, 1.0))
        if self.ntypes == 1:
            rcutij = jnp.full_like(r, (self.radelem[1] * 2.0) * self.rcutfac)
            wj = self.wjelem[1]
        else:
            rcutij = (self.radelem[ti] + self.radelem[tj]) * self.rcutfac
            wj = self.wjelem[tj]
        inside = valid & (r < rcutij)
        # all masked-branch intermediates must stay FINITE (where-grad rule):
        # clamp the cutoff away from rmin0 and park masked r mid-shell
        rcut_s = jnp.maximum(rcutij, self.rmin0 + 1e-2)
        rs = jnp.where(inside, r, 0.5 * (rcut_s + self.rmin0))

        # ref: compute_ui geometry
        theta0 = (rs - self.rmin0) * self.rfac0 * jnp.pi / (
            rcut_s - self.rmin0
        )
        z0 = rs / jnp.tan(theta0)
        r0inv = 1.0 / jnp.sqrt(rs * rs + z0 * z0)
        x, y, z = dx[..., 0], dx[..., 1], dx[..., 2]
        a = (r0inv * (z0 - 1j * z)).astype(cdtype)
        b = (r0inv * (y - 1j * x)).astype(cdtype)

        # sfac (ref: compute_sfac) * element weight
        if self.switchflag:
            t = (rs - self.rmin0) * jnp.pi / (rcut_s - self.rmin0)
            sfac = jnp.where(
                rs <= self.rmin0, 1.0,
                0.5 * (jnp.cos(t) + 1.0),
            )
        else:
            sfac = jnp.ones_like(rs)
        w = jnp.where(inside, sfac * wj, 0.0)

        levels = self._ulist_levels(a, b)  # list of [C,K,j+1,j+1]
        utot_parts = []
        for j, ul in enumerate(levels):
            usum = jnp.einsum("ck,ckab->cab", w.astype(dt), ul)
            # self term (ref: add_self_uarraytot, wself = 1)
            eye = jnp.eye(j + 1, dtype=usum.dtype)
            usum = usum + eye
            utot_parts.append(usum.reshape(usum.shape[0], -1))
        utot = jnp.concatenate(utot_parts, axis=-1)  # [C, idxu_max] complex

        u1 = utot[:, self.tu1]
        u2 = utot[:, self.tu2]
        u3 = utot[:, self.tu3]
        terms = jnp.real(u1 * u2 * jnp.conj(u3)) * self.tw.astype(dt)
        B = jnp.zeros((utot.shape[0], self.idxb_max), dtype=dt)
        B = B.at[:, self.tb].add(terms)
        if self.bzeroflag:
            B = B - self.bzero[None, :]
        return B

    def _energy_chunk(self, dx, r2, valid, ti, tj, owned):
        B = self._bispectrum(dx, r2, valid, ti[:, None], tj)
        if self.ntypes == 1:
            beta = self.beta[1]
            c0 = self.coeff0[1]
            e = c0 + B @ beta
            q = self.quad[1] if self.quadraticflag else None
        else:
            beta = self.beta[ti]
            c0 = self.coeff0[ti]
            e = c0 + jnp.sum(B * beta, axis=-1)
            q = self.quad[ti] if self.quadraticflag else None
        if self.quadraticflag:
            iu, ju = np.triu_indices(self.beta.shape[1])
            bb = B[:, iu] * B[:, ju]
            scale = jnp.asarray(np.where(iu == ju, 0.5, 1.0), dtype=B.dtype)
            if self.ntypes == 1:
                e = e + bb @ (q * scale)
            else:
                e = e + jnp.sum(bb * (q * scale[None, :]), axis=-1)
        return jnp.sum(jnp.where(owned, e, 0.0))

    def _total_energy(self, state, nl, x, eps=None):
        cap = state.capacity
        j = nl.idx
        jc = jnp.clip(j, 0, cap - 1)
        pair_valid = j < cap
        owned = state.owned_mask
        C = self.chunk if cap > self.chunk else cap
        nch = -(-cap // C)
        capp = nch * C
        # pad atom dim to a chunk multiple
        pad = capp - cap

        def padded(arr, fill=0):
            if pad == 0:
                return arr
            pw = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
            return jnp.pad(arr, pw, constant_values=fill)

        xi_all = padded(x)
        jc_all = padded(jc)
        pv_all = padded(pair_valid, fill=False)
        ow_all = padded(owned, fill=False)
        ti_all = padded(state.type)
        xj_lookup = x
        tj_lookup = state.type

        def one(args):
            xi, jcc, pv, ow, ti = args
            xj = xj_lookup[jcc]
            dxc = state.box.min_image(xi[:, None, :] - xj)
            if eps is not None:
                dxc = dxc + dxc @ eps.T  # affine strain (virial derivative)
            r2 = jnp.sum(dxc * dxc, axis=-1)
            tj = tj_lookup[jcc]
            return self._energy_chunk(dxc, r2, pv, ti, tj, ow)

        args = (
            xi_all.reshape(nch, C, 3),
            jc_all.reshape(nch, C, -1),
            pv_all.reshape(nch, C, -1),
            ow_all.reshape(nch, C),
            ti_all.reshape(nch, C),
        )
        if nch == 1:
            return one(jax.tree.map(lambda a: a[0], args))
        es = jax.lax.map(one, args)
        return jnp.sum(es)

    def compute(self, state, nl, eflag: bool, vflag: bool,
                special_lj=None, special_coul=None):
        e, neg_f = jax.value_and_grad(
            lambda xx: self._total_energy(state, nl, xx)
        )(state.x)
        f = -neg_f
        virial = None
        if vflag:
            # strain derivative on the displacement field (exact many-body
            # PBC virial, same construction as pair_tersoff/pair_sw)
            def e_strained(eps):
                return self._total_energy(state, nl, state.x, eps=eps)

            w = -jax.grad(e_strained)(jnp.zeros((3, 3), dtype=state.dtype))
            virial = jnp.stack([
                w[0, 0], w[1, 1], w[2, 2],
                0.5 * (w[0, 1] + w[1, 0]),
                0.5 * (w[0, 2] + w[2, 0]),
                0.5 * (w[1, 2] + w[2, 1]),
            ])
        return f, (e if eflag else None), virial


_IDXB_CACHE: dict = {}


def make_snap(
    ntypes: int,
    coeff_path: str,
    param_path: str,
    type_elements: list[str] | None = None,
    dtype=jnp.float64,
    chunk: int = 512,
) -> PairSNAP:
    info = read_snap_files(coeff_path, param_path)
    twojmax = int(info["twojmax"])
    tables = build_snap_tables(twojmax)
    _IDXB_CACHE[twojmax] = tables["idxb"]
    ncoeff_lin = len(tables["idxb"])

    elements = info["elements"]
    if type_elements is None:
        type_elements = [elements[0]] * ntypes
    emap = [elements.index(e) for e in type_elements]

    nt = ntypes
    coeff0 = np.zeros(nt + 1)
    beta = np.zeros((nt + 1, ncoeff_lin))
    nquad = ncoeff_lin * (ncoeff_lin + 1) // 2
    quadflag = int(info["quadraticflag"])
    quad = np.zeros((nt + 1, nquad if quadflag else 0))
    radelem = np.zeros(nt + 1)
    wjelem = np.zeros(nt + 1)
    for t in range(1, nt + 1):
        ce = info["coeffs"][emap[t - 1]]
        coeff0[t] = ce[0]
        beta[t] = ce[1:1 + ncoeff_lin]
        if quadflag:
            quad[t] = ce[1 + ncoeff_lin:1 + ncoeff_lin + nquad]
        radelem[t] = info["radelem"][emap[t - 1]]
        wjelem[t] = info["wjelem"][emap[t - 1]]

    rcutfac = float(info["rcutfac"])
    cut = np.zeros((nt + 1, nt + 1))
    for i in range(1, nt + 1):
        for jt in range(1, nt + 1):
            cut[i, jt] = (radelem[i] + radelem[jt]) * rcutfac
    cutmax = float(cut[1:, 1:].max())

    # bzero per B component (ref: sna.cpp init: bzero[j] = www*(j+1),
    # wself = 1, bnorm off; subtracted per (j1,j2,j) using its j)
    bzero = np.array([(j + 1.0) for (_, _, j) in tables["idxb"]])

    asdt = lambda a: jnp.asarray(a, dtype=dtype)
    return PairSNAP(
        coeff0=asdt(coeff0), beta=asdt(beta), quad=asdt(quad),
        radelem=asdt(radelem), wjelem=asdt(wjelem), cutsq=asdt(cut * cut),
        tu1=jnp.asarray(tables["u1"]), tu2=jnp.asarray(tables["u2"]),
        tu3=jnp.asarray(tables["u3"]), tb=jnp.asarray(tables["b"]),
        tw=asdt(tables["w"]), bzero=asdt(bzero),
        ntypes=nt, twojmax=twojmax,
        idxu_max=tables["idxu_max"], idxb_max=ncoeff_lin,
        rcutfac=rcutfac, rfac0=float(info["rfac0"]),
        rmin0=float(info["rmin0"]), switchflag=int(info["switchflag"]),
        bzeroflag=int(info["bzeroflag"]),
        quadraticflag=quadflag, cutmax=cutmax,
        idxu_block=tuple(tables["idxu_block"]), chunk=chunk,
    )
