"""Red-blood-cell membrane styles — the fork's hand-ported trio.

TPU-native re-design of the "Moein" RBC styles (SURVEY.md §2.11):
  - bond wlc_pow_all_visc   (ref: src/bond_wlc_pow_all_visc.cpp, Kokkos
    port src/KOKKOS/bond_wlc_pow_all_visc_kokkos.cpp): worm-like-chain +
    power-law bead-spring with viscous damping and a fluctuation-
    dissipation stochastic term (DPD-like Wiener matrix per bond).
  - angle area_volume3      (ref: src/angle_area_volume3.cpp, Kokkos port
    angle_area_volume3_kokkos.cpp): membrane triangle style enforcing
    per-molecule global area/volume conservation plus local triangle area
    and an internal-pressure term; the per-molecule area/volume reductions
    (MPI_Allreduce in the reference) are segment-sums here.
  - dihedral bend2          (ref: src/dihedral_bend2.cpp, Kokkos port
    dihedral_bend2_kokkos.cpp): membrane bending between adjacent
    triangles with the spontaneous angle taken from the reference
    configuration x0.

All three consume the reference positions `x0` (the fork's
atom_vec_x0image field, ref: src/KOKKOS/atom_vec_x0image_kokkos.cpp)
carried in `state.aux["x0"]` — captured at setup. Displacements use RAW
coordinate differences exactly like the reference (its minimum_image
calls are commented out: membranes are kept unwrapped within a molecule),
and the triangle-center volume term unwraps all three vertices by the
FIRST vertex's image flags (ref: angle_area_volume3.cpp:190-206).

Unlike the harmonic/charmm styles these are explicit-force styles (the
WLC bond is non-conservative: viscous + stochastic terms), so each class
provides `compute(state, top, eflag, vflag)` directly instead of an
autodiffed `energy_one`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from ..core.topology import Topology

Array = jax.Array


def _x0(state: State) -> Array:
    x0 = state.aux.get("x0")
    if x0 is None:
        raise ValueError(
            "RBC styles need reference positions: state.aux['x0'] "
            "(captured at setup; the fork's atom_vec_x0image field)")
    return x0


def _voigt(m: Array) -> Array:
    return jnp.array([m[0, 0], m[1, 1], m[2, 2], m[0, 1], m[0, 2], m[1, 2]])


# ---------------------------------------------------------------------------
# bond wlc_pow_all_visc
# ---------------------------------------------------------------------------


@partial(jax.tree_util.register_dataclass,
         data_fields=["temp", "r0", "mu_targ", "qp", "gamc", "gamt",
                      "sigc", "sigt"],
         meta_fields=["seed"])
@dataclasses.dataclass(frozen=True)
class BondWLCPowAllVisc:
    """WLC + POW + viscous + stochastic bead-spring bond.

    coeffs per type: temp (k_B T), r0 (lmax/l0 ratio), mu_targ (target
    shear modulus), qp (power-law exponent), gamc, gamt (central/tangential
    friction); sigc/sigt are the fluctuation-dissipation amplitudes
    sqrt(2 T (3 gamc - gamt))/sqrt(dt) and 2 sqrt(gamt T)/sqrt(dt)
    (ref: bond_wlc_pow_all_visc.cpp:65-79 init_style).

    The per-bond equilibrium length l0 comes from x0 (ref: :114-117); the
    stochastic term contracts a per-bond 3x3 Wiener matrix of standard
    normals with the bond vector (ref: generate_wrr :304-338) — here drawn
    from a counter-based key (seed, ntimestep, bond index), which keeps the
    trajectory decomposition-invariant (the reference's per-rank RanMars
    stream is not).
    """

    temp: Array
    r0: Array
    mu_targ: Array
    qp: Array
    gamc: Array
    gamt: Array
    sigc: Array
    sigt: Array
    seed: int

    def compute(self, state: State, top: Topology, eflag, vflag):
        bonds = top.bonds
        t = bonds[:, 0]
        i, j = bonds[:, 1], bonds[:, 2]
        cap = state.capacity
        valid = t > 0
        ii = jnp.clip(i, 0, cap - 1)
        jj = jnp.clip(j, 0, cap - 1)
        x0 = _x0(state)
        d0 = x0[ii] - x0[jj]
        l0 = jnp.sqrt(jnp.sum(d0 * d0, axis=-1))
        l0 = jnp.where(valid, l0, 1.0)

        dx = state.x[ii] - state.x[jj]          # raw difference (ref :119)
        dv = state.v[ii] - state.v[jj]
        ra = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        ra = jnp.where(valid, ra, 1.0)

        temp = self.temp[t]
        r0t = self.r0[t]
        qp = self.qp[t]
        gamc, gamt = self.gamc[t], self.gamt[t]
        sigc, sigt = self.sigc[t], self.sigt[t]

        lmax = l0 * r0t
        rrp = 1.0 / r0t                          # l0/lmax (ref :129)
        kph = l0 ** qp * temp * (0.25 / (1.0 - rrp) ** 2 - 0.25 + rrp)
        mu = 0.25 * jnp.sqrt(3.0) * (
            temp * (-0.25 / (1.0 - rrp) ** 2 + 0.25
                    + 0.5 * rrp / (1.0 - rrp) ** 3) / lmax / rrp
            + kph * (qp + 1.0) / l0 ** (qp + 1.0))
        lam = mu / self.mu_targ[t]
        kph = kph * self.mu_targ[t] / mu
        rr = ra / lmax
        rlogarg = ra ** (qp + 1.0)
        vv = jnp.sum(dx * dv, axis=-1) / ra

        # Wiener matrix: 9 iid standard normals per bond per step
        # (the polar Box-Muller loop of generate_wrr draws exactly these)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                 state.ntimestep)
        ww = jax.random.normal(key, (bonds.shape[0], 3, 3),
                               dtype=state.dtype)
        tr3 = (ww[:, 0, 0] + ww[:, 1, 1] + ww[:, 2, 2]) / 3.0
        sym = 0.5 * (ww + jnp.swapaxes(ww, 1, 2))
        sym = sym - tr3[:, None, None] * jnp.eye(3, dtype=state.dtype)
        wrr = jnp.einsum("nab,nb->na", sym, dx)  # (ref :335-337)

        fforce = (-temp * (0.25 / (1.0 - rr) ** 2 - 0.25 + rr) / lam / ra
                  + kph / rlogarg
                  + (sigc * tr3 - gamc * vv) / ra)
        fi = (dx * fforce[:, None] - gamt[:, None] * dv
              + sigt[:, None] * wrr / ra[:, None])     # (ref :156-158)
        fi = jnp.where(valid[:, None], fi, 0.0)

        f = jnp.zeros_like(state.x)
        f = f.at[i].add(fi, mode="drop")
        f = f.at[j].add(-fi, mode="drop")

        energy = None
        if eflag:
            e = 0.25 * temp * lmax * (3.0 * rr * rr - 2.0 * rr ** 3) \
                / (1.0 - rr) / lam
            e = e + jnp.where(
                qp == 1.0,
                -kph * jnp.log(ra),
                kph / jnp.where(qp == 1.0, 1.0, qp - 1.0) / ra ** (qp - 1.0))
            energy = jnp.sum(jnp.where(valid, e, 0.0))
        virial = _voigt(jnp.einsum("na,nb->ab", dx, fi)) if vflag else None
        return f, energy, virial


def make_bond_wlc_pow_all_visc(ntypes, coeffs, dt, seed=2846,
                               dtype=jnp.float64) -> BondWLCPowAllVisc:
    """coeffs: {type: (temp, r0, mu_targ, qp, gamc, gamt)}
    (ref: bond_wlc_pow_all_visc.cpp:201-230 coeff, 7 args)."""
    tab = np.zeros((6, ntypes + 1))
    for ty, c in coeffs.items():
        tab[:, ty] = c[:6]
    temp, r0, mu, qp, gamc, gamt = tab
    sdtt = np.sqrt(dt)
    sigc = np.sqrt(np.maximum(2.0 * temp * (3.0 * gamc - gamt), 0.0)) / sdtt
    sigt = 2.0 * np.sqrt(np.maximum(gamt * temp, 0.0)) / sdtt
    arr = lambda a: jnp.asarray(a, dtype=dtype)
    return BondWLCPowAllVisc(
        temp=arr(temp), r0=arr(r0), mu_targ=arr(mu), qp=arr(qp),
        gamc=arr(gamc), gamt=arr(gamt), sigc=arr(sigc), sigt=arr(sigt),
        seed=int(seed))


# ---------------------------------------------------------------------------
# angle area_volume3
# ---------------------------------------------------------------------------


@partial(jax.tree_util.register_dataclass,
         data_fields=["ka", "a0", "kv", "v0", "kl", "aa0", "press", "qp",
                      "r0", "nstep1", "nstep2", "vratio"],
         meta_fields=["nmol"])
@dataclasses.dataclass(frozen=True)
class AngleAreaVolume3:
    """Membrane triangle style: global area (ka/a0) + global volume
    (kv/v0, with a linear v0 -> v0*vratio ramp between steps nstep1 and
    nstep2), local triangle area (kl, vs the x0 reference triangle), and
    an internal pressure term (press/qp) (ref: angle_area_volume3.cpp).

    Each "angle" (type, i1, i2, i3) is one surface triangle of a closed
    membrane; per-molecule area A_m = sum 0.5|n| and volume
    V_m = sum n.center/18 (divergence theorem) reduce over the molecule id
    (ref :108-252 with MPI_Allreduce; here a segment_sum over nmol slots).
    """

    ka: Array
    a0: Array
    kv: Array
    v0: Array
    kl: Array
    aa0: Array
    press: Array
    qp: Array
    r0: Array
    nstep1: Array
    nstep2: Array
    vratio: Array
    nmol: int

    def _voltemp(self, t, step):
        """v0 ramp (ref :258-268): constant before nstep1, linear to
        v0*vratio by nstep2, constant after."""
        n1, n2 = self.nstep1[t], self.nstep2[t]
        v0, vr = self.v0[t], self.vratio[t]
        fs = step.astype(v0.dtype)
        frac = (fs - n1) / jnp.maximum(n2 - n1, 1.0)
        frac = jnp.clip(frac, 0.0, 1.0)
        return v0 * (1.0 + frac * (vr - 1.0))

    def compute(self, state: State, top: Topology, eflag, vflag):
        ang = top.angles
        t = ang[:, 0]
        i1, i2, i3 = ang[:, 1], ang[:, 2], ang[:, 3]
        cap = state.capacity
        valid = t > 0
        c1 = jnp.clip(i1, 0, cap - 1)
        c2 = jnp.clip(i2, 0, cap - 1)
        c3 = jnp.clip(i3, 0, cap - 1)
        x = state.x
        x1, x2, x3 = x[c1], x[c2], x[c3]

        d21 = x2 - x1
        d31 = x3 - x1
        d32 = x3 - x2
        n = jnp.cross(d21, d31)
        nn = jnp.sqrt(jnp.sum(n * n, axis=-1))
        nn = jnp.where(valid, nn, 1.0)
        aa = 0.5 * nn

        # unwrap ALL THREE vertices by vertex 1's image (ref :190-206:
        # domain->unmap with image[i1] for xx1, xx2, xx3 alike)
        prd = state.box.prd.astype(state.dtype)
        shift = state.image[c1].astype(state.dtype) * prd
        center = (x1 + x2 + x3) + 3.0 * shift
        vv = jnp.sum(n * center, axis=-1) / 18.0

        mol = state.molecule[c1] - 1  # 0-based molecule slot
        mol = jnp.where(valid, mol, self.nmol)  # park padding out of range
        A = jax.ops.segment_sum(jnp.where(valid, aa, 0.0), mol,
                                num_segments=self.nmol + 1)[:self.nmol]
        V = jax.ops.segment_sum(jnp.where(valid, vv, 0.0), mol,
                                num_segments=self.nmol + 1)[:self.nmol]

        # reference triangle area from x0 (ref :294-310)
        x0 = _x0(state)
        n0 = jnp.cross(x0[c2] - x0[c1], x0[c3] - x0[c1])
        ar0 = 0.5 * jnp.sqrt(jnp.sum(n0 * n0, axis=-1))
        ar0 = jnp.where(valid, ar0, 1.0)

        Am = A[jnp.clip(mol, 0, self.nmol - 1)]
        Vm = V[jnp.clip(mol, 0, self.nmol - 1)]
        voltemp = self._voltemp(t, state.ntimestep)

        coefc = 0.25 * self.press[t] * self.qp[t] \
            / (0.5 * nn) ** (self.qp[t] + 2.0)
        coefl = 0.5 * self.kl[t] * (ar0 - 0.5 * nn) / ar0 / nn
        coefa = 0.5 * self.ka[t] * (self.a0[t] - Am) / self.a0[t] / nn
        coefca = coefc + coefl + coefa
        coefv = self.kv[t] * (voltemp - Vm) / voltemp / 18.0

        s1 = coefca[:, None] * jnp.cross(n, d32)       # (ref :389-399)
        s2 = coefca[:, None] * jnp.cross(d31, n)
        s3 = coefca[:, None] * jnp.cross(n, d21)
        fv = coefv[:, None] * n
        f1 = jnp.where(valid[:, None], s1 + fv, 0.0)
        f2 = jnp.where(valid[:, None], s2 + fv, 0.0)
        f3 = jnp.where(valid[:, None], s3 + fv, 0.0)

        f = jnp.zeros_like(state.x)
        f = f.at[i1].add(f1, mode="drop")
        f = f.at[i2].add(f2, mode="drop")
        f = f.at[i3].add(f3, mode="drop")

        energy = None
        if eflag:
            # the reference tallies ONLY the local-area term per triangle
            # (ev_tally gets eangle = the kl term, ref :383-386); the
            # global area/volume energies are computed for the printf only
            e_l = jnp.where(
                valid,
                0.5 * self.kl[t] * (ar0 - 0.5 * nn) ** 2 / ar0, 0.0)
            energy = jnp.sum(e_l)
        virial = None
        if vflag:
            # per-triangle virial rows (ref ff[6] :452-458)
            sv1 = jnp.where(valid[:, None], fv, 0.0)
            xx = (jnp.einsum("na,nb->ab", d21, jnp.where(valid[:, None],
                                                         s2, 0.0))
                  + jnp.einsum("na,nb->ab", d31, jnp.where(valid[:, None],
                                                           s3, 0.0)))
            # volume-term virial: (d21 (x) (s2v-s1v) + ...)/3 with all
            # s*v equal -> zero contribution; keep the area/local rows
            del sv1
            virial = _voigt(xx)
        return f, energy, virial


def make_angle_area_volume3(ntypes, coeffs, nmol,
                            dtype=jnp.float64) -> AngleAreaVolume3:
    """coeffs: {type: (ka, a0, kv, v0, kl, aa0, press, qp, r0, nstep1,
    nstep2, vratio)} (ref: angle_area_volume3.cpp:497-536, 13 args)."""
    tab = np.zeros((12, ntypes + 1))
    tab[1, 0] = tab[3, 0] = 1.0  # avoid 0/0 on padding type slots
    tab[10, 0] = 1.0
    for ty, c in coeffs.items():
        tab[:, ty] = c[:12]
    arr = lambda a: jnp.asarray(a, dtype=dtype)
    return AngleAreaVolume3(
        ka=arr(tab[0]), a0=arr(tab[1]), kv=arr(tab[2]), v0=arr(tab[3]),
        kl=arr(tab[4]), aa0=arr(tab[5]), press=arr(tab[6]), qp=arr(tab[7]),
        r0=arr(tab[8]), nstep1=arr(tab[9]), nstep2=arr(tab[10]),
        vratio=arr(tab[11]), nmol=int(nmol))


# ---------------------------------------------------------------------------
# dihedral bend2
# ---------------------------------------------------------------------------


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "theta0"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class DihedralBend2:
    """Membrane bending between triangles (i1,i2,i3) and (i4,i2,i3):
    E = k (1 - cos(theta - theta0_spont)) where the spontaneous angle
    comes from the x0 reference configuration (ref: dihedral_bend2.cpp:
    86-148 computes costheta0/sintheta0 from x0, :240-245 energy)."""

    k: Array
    theta0: Array  # stored per the coeff signature; geometry uses x0

    @staticmethod
    def _costsint(x1, x2, x3, x4):
        d21 = x2 - x1
        d31 = x3 - x1
        d34 = x3 - x4
        d24 = x2 - x4
        d14 = x1 - x4
        n1 = jnp.cross(d21, d31)
        n2 = jnp.cross(d34, d24)
        n1sq = jnp.sum(n1 * n1, axis=-1)
        n2sq = jnp.sum(n2 * n2, axis=-1)
        nn = jnp.sqrt(n1sq * n2sq)
        nn = jnp.maximum(nn, 1e-30)
        cost = jnp.clip(jnp.sum(n1 * n2, axis=-1) / nn, -1.0, 1.0)
        sint = jnp.maximum(jnp.sqrt(1.0 - cost * cost), 0.001)  # SMALL
        mx = jnp.sum((n1 - n2) * d14, axis=-1)
        sint = jnp.where(mx < 0, -sint, sint)
        return cost, sint, n1, n2, n1sq, n2sq, nn

    def compute(self, state: State, top: Topology, eflag, vflag):
        dih = top.dihedrals
        t = dih[:, 0]
        i1, i2, i3, i4 = dih[:, 1], dih[:, 2], dih[:, 3], dih[:, 4]
        cap = state.capacity
        valid = t > 0
        c = [jnp.clip(a, 0, cap - 1) for a in (i1, i2, i3, i4)]
        x0 = _x0(state)
        cost0, sint0, *_ = self._costsint(x0[c[0]], x0[c[1]], x0[c[2]],
                                          x0[c[3]])
        x = state.x
        x1, x2, x3, x4 = x[c[0]], x[c[1]], x[c[2]], x[c[3]]
        cost, sint, n1, n2, n1sq, n2sq, nn = self._costsint(x1, x2, x3, x4)

        d21 = x2 - x1
        d31 = x3 - x1
        d32 = x3 - x2
        d34 = x3 - x4
        d24 = x2 - x4

        alfa = self.k[t] * (cost0 - cost * sint0 / sint)  # (ref :215)
        a11 = -alfa * cost / jnp.where(valid, n1sq, 1.0)
        a12 = alfa / jnp.where(valid, nn, 1.0)
        a22 = -alfa * cost / jnp.where(valid, n2sq, 1.0)
        a11 = a11[:, None]
        a12 = a12[:, None]
        a22 = a22[:, None]

        s1 = a11 * jnp.cross(n1, d32) + a12 * jnp.cross(n2, d32)
        s2 = (a11 * jnp.cross(d31, n1) + a22 * jnp.cross(n2, d34)
              + a12 * (jnp.cross(d31, n2) + jnp.cross(n1, d34)))
        s3 = (a11 * jnp.cross(n1, d21) + a22 * jnp.cross(d24, n2)
              + a12 * (jnp.cross(n2, d21) + jnp.cross(d24, n1)))
        s4 = a22 * jnp.cross(d32, n2) + a12 * jnp.cross(d32, n1)

        f1 = jnp.where(valid[:, None], s1, 0.0)
        f2 = jnp.where(valid[:, None], s2, 0.0)
        f3 = jnp.where(valid[:, None], s3, 0.0)
        f4 = jnp.where(valid[:, None], s4, 0.0)

        f = jnp.zeros_like(state.x)
        f = f.at[i1].add(f1, mode="drop")
        f = f.at[i2].add(f2, mode="drop")
        f = f.at[i3].add(f3, mode="drop")
        f = f.at[i4].add(f4, mode="drop")

        energy = None
        if eflag:
            e = self.k[t] * (1.0 - (cost * cost0 + sint * sint0))
            energy = jnp.sum(jnp.where(valid, e, 0.0))
        virial = None
        if vflag:
            # r measured from x2: r1 = -d21, r3 = d32, r4 = -d24
            virial = _voigt(
                jnp.einsum("na,nb->ab", -d21, f1)
                + jnp.einsum("na,nb->ab", d32, f3)
                + jnp.einsum("na,nb->ab", -d24, f4))
        return f, energy, virial


def make_dihedral_bend2(ntypes, coeffs, dtype=jnp.float64) -> DihedralBend2:
    """coeffs: {type: (k, theta0)} (ref: dihedral_bend2.cpp:320-333)."""
    tab = np.zeros((2, ntypes + 1))
    for ty, cf in coeffs.items():
        tab[:, ty] = cf[:2]
    return DihedralBend2(k=jnp.asarray(tab[0], dtype=dtype),
                         theta0=jnp.asarray(tab[1], dtype=dtype))
