"""Extended bonded styles (MOLECULE/EXTRA-MOLECULE/CLASS2 packages).

Each style is a pure energy function over the interaction geometry; forces
come from autodiff in models/bonded.py's compute engines (the explicit
force algebra of each reference *.cpp is the hand-derived gradient of the
same expression — autodiff deletes it).

Styles + reference files:
  bonds:     gromos, morse, nonlinear, class2, harmonic/shift[/cut],
             fene/expand
  angles:    cosine/squared, quartic, cosine/delta, cosine/periodic,
             fourier, fourier/simple, cosine/shift[/exp]
  dihedrals: multi/harmonic, nharmonic, quadratic, helix
  impropers: cvff, cossq, umbrella
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bonded import _acos_safe, _dihedral_phi, table

Array = jax.Array
_D2R = np.pi / 180.0


def _style(fields):
    def deco(cls):
        return partial(jax.tree_util.register_dataclass,
                       data_fields=fields, meta_fields=[])(
            dataclasses.dataclass(frozen=True)(cls))
    return deco


def _r(dx):
    return jnp.sqrt(jnp.sum(dx * dx))


def _costheta(d1, d2):
    return d1 @ d2 / jnp.sqrt(jnp.sum(d1 * d1) * jnp.sum(d2 * d2))


def _angle_explicit(fpair, state, top, eflag, vflag):
    """Shared driver for explicit-force angle styles: fpair(d1, d2, t) ->
    (f1, f3, e) per angle; f2 = -(f1+f3) (ref: Angle::ev_tally layout)."""
    arr = top.angles
    t = arr[:, 0]
    i, j, k = arr[:, 1], arr[:, 2], arr[:, 3]
    cap = state.capacity
    valid = t > 0
    x = state.x
    d1 = state.box.min_image(x[jnp.clip(i, 0, cap - 1)]
                             - x[jnp.clip(j, 0, cap - 1)])
    d2 = state.box.min_image(x[jnp.clip(k, 0, cap - 1)]
                             - x[jnp.clip(j, 0, cap - 1)])
    f1, f3, e = jax.vmap(fpair)(d1, d2, t)
    f1 = jnp.where(valid[:, None], f1, 0.0)
    f3 = jnp.where(valid[:, None], f3, 0.0)
    f = jnp.zeros_like(state.x)
    f = f.at[i].add(f1, mode="drop")
    f = f.at[k].add(f3, mode="drop")
    f = f.at[j].add(-(f1 + f3), mode="drop")
    energy = jnp.sum(jnp.where(valid, e, 0.0)) if eflag else None
    virial = None
    if vflag:
        m = (jnp.einsum("na,nb->ab", d1, f1)
             + jnp.einsum("na,nb->ab", d2, f3))
        virial = jnp.array([m[0, 0], m[1, 1], m[2, 2],
                            m[0, 1], m[0, 2], m[1, 2]])
    return f, energy, virial


# -- bonds -------------------------------------------------------------------


@_style(["k", "r0"])
class BondGromos:
    """E = K (r^2 - r0^2)^2 (ref: src/MOLECULE/bond_gromos.cpp)."""

    k: Array
    r0: Array

    def energy_one(self, dx, t):
        dr = jnp.sum(dx * dx) - self.r0[t] * self.r0[t]
        return self.k[t] * dr * dr


@_style(["d0", "alpha", "r0"])
class BondMorse:
    """E = D (1 - e^{-alpha (r-r0)})^2 (ref: src/MOLECULE/bond_morse.cpp)."""

    d0: Array
    alpha: Array
    r0: Array

    def energy_one(self, dx, t):
        ralpha = jnp.exp(-self.alpha[t] * (_r(dx) - self.r0[t]))
        return self.d0[t] * (1.0 - ralpha) ** 2


@_style(["epsilon", "r0", "lamda"])
class BondNonlinear:
    """E = eps dr^2 / (lamda^2 - dr^2)
    (ref: src/EXTRA-MOLECULE/bond_nonlinear.cpp)."""

    epsilon: Array
    r0: Array
    lamda: Array

    def energy_one(self, dx, t):
        dr = _r(dx) - self.r0[t]
        drsq = dr * dr
        return self.epsilon[t] * drsq / (self.lamda[t] ** 2 - drsq)


@_style(["r0", "k2", "k3", "k4"])
class BondClass2:
    """E = K2 dr^2 + K3 dr^3 + K4 dr^4 (ref: src/CLASS2/bond_class2.cpp)."""

    r0: Array
    k2: Array
    k3: Array
    k4: Array

    def energy_one(self, dx, t):
        dr = _r(dx) - self.r0[t]
        return dr * dr * (self.k2[t] + dr * (self.k3[t] + dr * self.k4[t]))


@_style(["k", "r0", "r1"])
class BondHarmonicShift:
    """E = Umin/(r0-rc)^2 [ (r-r0)^2 - (rc-r0)^2 ]; k = Umin/(r0-rc)^2
    (ref: src/EXTRA-MOLECULE/bond_harmonic_shift.cpp, coeff Umin r0 rc)."""

    k: Array
    r0: Array
    r1: Array

    def energy_one(self, dx, t):
        dr = _r(dx) - self.r0[t]
        d01 = self.r0[t] - self.r1[t]
        return self.k[t] * (dr * dr - d01 * d01)


@_style(["k", "r0", "r1"])
class BondHarmonicShiftCut(BondHarmonicShift):
    """harmonic/shift zeroed beyond rc
    (ref: src/EXTRA-MOLECULE/bond_harmonic_shift_cut.cpp)."""

    k: Array
    r0: Array
    r1: Array

    def energy_one(self, dx, t):
        e = BondHarmonicShift.energy_one(self, dx, t)
        return jnp.where(_r(dx) < self.r1[t], e, 0.0)


@_style(["k", "r0", "epsilon", "sigma", "shift"])
class BondFENEExpand:
    """FENE with a length shift delta: the WCA + log terms act on r - delta
    (ref: src/MOLECULE/bond_fene_expand.cpp)."""

    k: Array
    r0: Array
    epsilon: Array
    sigma: Array
    shift: Array

    def energy_one(self, dx, t):
        rshift = _r(dx) - self.shift[t]
        r0sq = self.r0[t] * self.r0[t]
        rlogarg = 1.0 - rshift * rshift / r0sq
        e = -0.5 * self.k[t] * r0sq * jnp.log(jnp.maximum(rlogarg, 1e-12))
        sr2 = self.sigma[t] ** 2 / (rshift * rshift)
        sr6 = sr2 * sr2 * sr2
        wca = 4.0 * self.epsilon[t] * sr6 * (sr6 - 1.0) + self.epsilon[t]
        inside = rshift * rshift < 2.0 ** (1.0 / 3.0) * self.sigma[t] ** 2
        return e + jnp.where(inside, wca, 0.0)


# -- angles ------------------------------------------------------------------


@_style(["k", "theta0"])
class AngleCosineSquared:
    """E = K (cos theta - cos theta0)^2
    (ref: src/MOLECULE/angle_cosine_squared.cpp)."""

    k: Array
    theta0: Array

    def energy_one(self, d1, d2, t):
        dc = _costheta(d1, d2) - jnp.cos(self.theta0[t])
        return self.k[t] * dc * dc


@_style(["theta0", "k2", "k3", "k4"])
class AngleQuartic:
    """E = K2 dt^2 + K3 dt^3 + K4 dt^4
    (ref: src/EXTRA-MOLECULE/angle_quartic.cpp)."""

    theta0: Array
    k2: Array
    k3: Array
    k4: Array

    def energy_one(self, d1, d2, t):
        dt_ = _acos_safe(_costheta(d1, d2)) - self.theta0[t]
        return dt_ * dt_ * (self.k2[t] + dt_ * (self.k3[t] + dt_ * self.k4[t]))


@_style(["k", "theta0"])
class AngleCosineDelta:
    """E = K (1 - cos(theta - theta0))
    (ref: src/EXTRA-MOLECULE/angle_cosine_delta.cpp).

    Explicit forces: the reference's force expansion uses
    `cot = c * sin(theta)` (its `s` is inverted before the division,
    angle_cosine_delta.cpp:95-99), so the golden forces are NOT the exact
    energy gradient — replicated verbatim for fixture parity."""

    k: Array
    theta0: Array

    def compute(self, state, top, eflag, vflag):
        def fpair(d1, d2, t):
            rsq1 = jnp.sum(d1 * d1)
            rsq2 = jnp.sum(d2 * d2)
            r1r2 = jnp.sqrt(rsq1 * rsq2)
            c = jnp.clip(d1 @ d2 / r1r2, -1.0, 1.0)
            s = jnp.maximum(jnp.sqrt(1.0 - c * c), 0.001)
            cot = c * s  # upstream quirk: s = 1/s; cot = c/s
            a = -self.k[t]
            a11 = a * c / rsq1
            a12 = -a / r1r2
            a22 = a * c / rsq2
            b11 = -a * c * cot / rsq1
            b12 = a * cot / r1r2
            b22 = -a * c * cot / rsq2
            c0 = jnp.cos(self.theta0[t])
            s0 = jnp.sin(self.theta0[t])
            f1 = (a11 * d1 + a12 * d2) * c0 + (b11 * d1 + b12 * d2) * s0
            f3 = (a22 * d2 + a12 * d1) * c0 + (b22 * d2 + b12 * d1) * s0
            th = _acos_safe(c)
            e = self.k[t] * (1.0 - jnp.cos(th - self.theta0[t]))
            return f1, f3, e

        return _angle_explicit(fpair, state, top, eflag, vflag)


@_style(["k", "b", "n"])
class AngleCosinePeriodic:
    """E = (2C/n^2)(1 - B(-1)^n cos(n theta)), k stored = C/n^2
    (ref: src/EXTRA-MOLECULE/angle_cosine_periodic.cpp coeff/compute)."""

    k: Array
    b: Array
    n: Array

    def energy_one(self, d1, d2, t):
        th = _acos_safe(_costheta(d1, d2))
        n = self.n[t]
        sgn = jnp.where(jnp.mod(n, 2.0) > 0.5, -1.0, 1.0)  # (-1)^n
        tn = self.b[t] * sgn * jnp.cos(n * th)
        return 2.0 * self.k[t] * (1.0 - tn)


@_style(["k", "c0", "c1", "c2"])
class AngleFourier:
    """E = K (C0 + C1 cos + C2 cos 2t) (ref: EXTRA-MOLECULE/angle_fourier.cpp)."""

    k: Array
    c0: Array
    c1: Array
    c2: Array

    def energy_one(self, d1, d2, t):
        c = _costheta(d1, d2)
        return self.k[t] * (self.c0[t] + self.c1[t] * c
                            + self.c2[t] * (2.0 * c * c - 1.0))


@_style(["k", "c", "n"])
class AngleFourierSimple:
    """E = K (1 + c cos(n theta))
    (ref: EXTRA-MOLECULE/angle_fourier_simple.cpp).

    Explicit forces: the reference's `fabs(c)-1.0 > SMALL` branch guard is
    never true, so its force ALWAYS uses the small-angle series
    a = N + N(1-N^2) term/3 instead of sin(n th)/sin(th)
    (angle_fourier_simple.cpp:106-119) — replicated for fixture parity."""

    k: Array
    c: Array
    n: Array

    def compute(self, state, top, eflag, vflag):
        def fpair(d1, d2, t):
            rsq1 = jnp.sum(d1 * d1)
            rsq2 = jnp.sum(d2 * d2)
            r1r2 = jnp.sqrt(rsq1 * rsq2)
            c = jnp.clip(d1 @ d2 / r1r2, -1.0, 1.0)
            n = self.n[t]
            term = jnp.where(c >= 0.0, 1.0 - c, 1.0 + c)
            even = jnp.mod(n, 2.0) == 0.0
            sgn = jnp.where(c >= 0.0, 1.0, jnp.where(even, -1.0, 1.0))
            a = n + n * (1.0 - n * n) * term / 3.0
            a = self.k[t] * self.c[t] * n * sgn * a
            a11 = a * c / rsq1
            a12 = -a / r1r2
            a22 = a * c / rsq2
            f1 = a11 * d1 + a12 * d2
            f3 = a22 * d2 + a12 * d1
            th = _acos_safe(c)
            e = self.k[t] * (1.0 + self.c[t] * jnp.cos(n * th))
            return f1, f3, e

        return _angle_explicit(fpair, state, top, eflag, vflag)


@_style(["umin", "theta0"])
class AngleCosineShift:
    """E = -(Umin/2)(1 + cos(theta - theta0))
    (ref: EXTRA-MOLECULE/angle_cosine_shift.cpp: -k - kcos c - ksin s)."""

    umin: Array
    theta0: Array

    def energy_one(self, d1, d2, t):
        th = _acos_safe(_costheta(d1, d2))
        return -0.5 * self.umin[t] * (1.0 + jnp.cos(th - self.theta0[t]))


@_style(["umin", "theta0", "a"])
class AngleCosineShiftExp:
    """E = -Umin (e^{-a U} - 1)/(e^a - 1), U = -0.5(1+cos(theta-theta0))
    (ref: EXTRA-MOLECULE/angle_cosine_shift_exp.cpp)."""

    umin: Array
    theta0: Array
    a: Array

    def energy_one(self, d1, d2, t):
        th = _acos_safe(_costheta(d1, d2))
        u = -0.5 * (1.0 + jnp.cos(th - self.theta0[t]))
        a = self.a[t]
        return -self.umin[t] * jnp.expm1(-a * u) / jnp.expm1(a)


# -- dihedrals ---------------------------------------------------------------


@_style(["a1", "a2", "a3", "a4", "a5"])
class DihedralMultiHarmonic:
    """E = sum_i A_i cos^{i-1} phi
    (ref: src/MOLECULE/dihedral_multi_harmonic.cpp)."""

    a1: Array
    a2: Array
    a3: Array
    a4: Array
    a5: Array

    def energy_one(self, vb1, vb2, vb3, t):
        c = jnp.cos(_dihedral_phi(vb1, vb2, vb3))
        return self.a1[t] + c * (self.a2[t] + c * (
            self.a3[t] + c * (self.a4[t] + c * self.a5[t])))


@_style(["a"])
class DihedralNHarmonic:
    """E = sum_{i=1..n} A_i cos^{i-1} phi, per-type term count (padded
    coefficient matrix) (ref: EXTRA-MOLECULE/dihedral_nharmonic.cpp)."""

    a: Array  # [ntypes+1, nmax]

    def energy_one(self, vb1, vb2, vb3, t):
        c = jnp.cos(_dihedral_phi(vb1, vb2, vb3))
        coef = self.a[t]
        powers = c ** jnp.arange(coef.shape[0], dtype=c.dtype)
        return jnp.sum(coef * powers)


@_style(["k", "phi0"])
class DihedralQuadratic:
    """E = K (phi - phi0)^2, dphi wrapped to (-pi, pi]
    (ref: EXTRA-MOLECULE/dihedral_quadratic.cpp)."""

    k: Array
    phi0: Array

    def energy_one(self, vb1, vb2, vb3, t):
        dphi = _dihedral_phi(vb1, vb2, vb3) - self.phi0[t]
        dphi = dphi - 2.0 * jnp.pi * jnp.round(dphi / (2.0 * jnp.pi))
        return self.k[t] * dphi * dphi


@_style(["aphi", "bphi", "cphi"])
class DihedralHelix:
    """E = A(1-cos phi) + B(1+cos 3phi) + C(1+cos(phi+pi/4))
    (ref: EXTRA-MOLECULE/dihedral_helix.cpp)."""

    aphi: Array
    bphi: Array
    cphi: Array

    def energy_one(self, vb1, vb2, vb3, t):
        phi = _dihedral_phi(vb1, vb2, vb3)
        return (self.aphi[t] * (1.0 - jnp.cos(phi))
                + self.bphi[t] * (1.0 + jnp.cos(3.0 * phi))
                + self.cphi[t] * (1.0 + jnp.cos(phi + 0.25 * jnp.pi)))


# -- impropers (same charmm-convention bond vectors as bonded.py) ------------


@_style(["k", "d", "n"])
class ImproperCvff:
    """E = K (1 + d cos(n phi)), phi the improper quadruple's dihedral
    angle (ref: src/MOLECULE/improper_cvff.cpp Chebyshev ladder)."""

    k: Array
    d: Array
    n: Array

    def energy_one(self, vb1, vb2, vb3, t):
        phi = _dihedral_phi(vb1, vb2, vb3)
        return self.k[t] * (1.0 + self.d[t] * jnp.cos(self.n[t] * phi))


@_style(["k", "chi0"])
class ImproperCossq:
    """E = 0.5 K cos^2(tau - chi0), tau the angle between bonds 1->2 and
    3->4 (ref: EXTRA-MOLECULE/improper_cossq.cpp: rji = x2-x1 = -vb1,
    rlk = x4-x3 = vb3).

    Explicit forces replicate the reference verbatim: its
    angfac = -K cos(tau-chi) omits the d tau/d cos chain factor
    (improper_cossq.cpp:125-170), so the golden forces are not the exact
    gradient of the documented energy."""

    k: Array
    chi0: Array

    def compute(self, state, top, eflag, vflag):
        arr = top.impropers
        t = arr[:, 0]
        a1, a2, a3, a4 = arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4]
        cap = state.capacity
        valid = t > 0
        x = state.x
        c1 = jnp.clip(a1, 0, cap - 1)
        c2 = jnp.clip(a2, 0, cap - 1)
        c3 = jnp.clip(a3, 0, cap - 1)
        c4 = jnp.clip(a4, 0, cap - 1)
        rji = state.box.min_image(x[c2] - x[c1])
        rlk = state.box.min_image(x[c4] - x[c3])
        cjiji = jnp.sum(rji * rji, axis=-1)
        clklk = jnp.sum(rlk * rlk, axis=-1)
        clkji = jnp.sum(rlk * rji, axis=-1)
        denom = jnp.sqrt(jnp.where(valid, cjiji * clklk, 1.0))
        cosphi = jnp.clip(clkji / denom, -1.0, 1.0)
        tau = jnp.arccos(cosphi)
        cchi = jnp.cos(tau - self.chi0[t])
        angfac = -self.k[t] * cchi
        cfact1 = angfac / denom
        cfact2 = clkji / jnp.where(valid, clklk, 1.0)
        cfact3 = clkji / jnp.where(valid, cjiji, 1.0)
        f1 = cfact1[:, None] * (-rlk + cfact3[:, None] * rji)
        f3 = cfact1[:, None] * (cfact2[:, None] * rlk - rji)
        f1 = jnp.where(valid[:, None], f1, 0.0)
        f3 = jnp.where(valid[:, None], f3, 0.0)

        f = jnp.zeros_like(state.x)
        f = f.at[a1].add(f1, mode="drop")
        f = f.at[a2].add(-f1, mode="drop")
        f = f.at[a3].add(f3, mode="drop")
        f = f.at[a4].add(-f3, mode="drop")
        energy = None
        if eflag:
            e = 0.5 * self.k[t] * cchi * cchi
            energy = jnp.sum(jnp.where(valid, e, 0.0))
        virial = None
        if vflag:
            # ev_tally(i1,i2,i3,i4, f1,f3,f4, vb1,vb2,vb3) convention with
            # vb1 = x1-x2, vb2 = x3-x2, vb3 = x4-x3
            vb1 = -rji
            vb2 = state.box.min_image(x[c3] - x[c2])
            vb3 = rlk
            f4 = -f3
            m = (jnp.einsum("na,nb->ab", vb1, f1)
                 + jnp.einsum("na,nb->ab", vb2, f3)
                 + jnp.einsum("na,nb->ab", vb2 + vb3, f4))
            virial = jnp.array([m[0, 0], m[1, 1], m[2, 2],
                                m[0, 1], m[0, 2], m[1, 2]])
        return f, energy, virial


@_style(["k", "w0", "C"])
class ImproperUmbrella:
    """Wilson out-of-plane: w the angle between bond 1->4 and the 1-2-3
    plane. E = K(1 - cos w) if w0 == 0 else 0.5 C (cos w - cos w0)^2 with
    C = K/sin^2(w0) (ref: src/MOLECULE/improper_umbrella.cpp; its vb1/2/3
    all emanate from atom 1, remapped here from the charmm-convention
    vectors via x1=vb1, x2=0, x3=vb2, x4=vb2+vb3)."""

    k: Array
    w0: Array
    C: Array

    def energy_one(self, vb1, vb2, vb3, t):
        u1 = -vb1              # x2 - x1
        u2 = vb2 - vb1         # x3 - x1
        h = vb2 + vb3 - vb1    # x4 - x1
        a = jnp.cross(u1, u2)
        an = a / jnp.maximum(_r(a), 1e-12)
        hn = h / jnp.maximum(_r(h), 1e-12)
        c = jnp.clip(an @ hn, -1.0, 1.0)
        s = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-12))
        proj = hn @ (u1 / jnp.maximum(_r(u1), 1e-12)) \
            + hn @ (u2 / jnp.maximum(_r(u2), 1e-12))
        s = jnp.where(proj > 0.0, -s, s)
        # cos w = s (w measured from the plane)
        dom = s - jnp.cos(self.w0[t])
        return jnp.where(self.w0[t] == 0.0,
                         self.k[t] * (1.0 - s),
                         0.5 * self.C[t] * dom * dom)


# -- round-3 fixture-sweep styles --------------------------------------------
# YAFF / MOFFF / CLASS2 / EXTRA-MOLECULE additions; each is the reference
# style's energy with autodiffed forces.

_KB_REAL = 0.0019872067  # force->boltz, units real (update.cpp)


@_style(["bond_temp", "alpha", "width", "r0g"])
class BondGaussian:
    """E = -kB T ln( sum_i A_i/(w_i sqrt(pi/2)) e^{-2 dr^2/w_i^2} )
    (ref: src/EXTRA-MOLECULE/bond_gaussian.cpp single()). Variable term
    counts are padded with A=0 rows."""

    bond_temp: Array   # [ntypes+1]
    alpha: Array       # [ntypes+1, m]
    width: Array
    r0g: Array

    def energy_one(self, dx, t):
        r = _r(dx)
        dr = r - self.r0g[t]
        # log-sum-exp: the reference evaluates sum_i pref_i e^{expo_i}
        # directly and lets it go subnormal (its only guard is 2e-308,
        # bond_gaussian.cpp:30); we need the same values without underflow
        logp = jnp.log(self.alpha[t] / (self.width[t]
                                        * jnp.sqrt(jnp.pi / 2.0)))
        expo = -2.0 * dr * dr / self.width[t] ** 2
        terms = logp + expo
        m = jnp.max(terms)
        logs = m + jnp.log(jnp.sum(jnp.exp(terms - m)))
        return -(_KB_REAL * self.bond_temp[t]) * logs


@_style(["k2", "r0"])
class BondMM3:
    """E = K dr^2 (1 - 2.55 dr + 7/12 2.55^2 dr^2)
    (ref: src/YAFF/bond_mm3.cpp; angstrom units)."""

    k2: Array
    r0: Array

    def energy_one(self, dx, t):
        dr = _r(dx) - self.r0[t]
        return self.k2[t] * dr * dr * (
            1.0 - 2.55 * dr + (7.0 / 12.0) * 2.55 * 2.55 * dr * dr)


@_style(["k", "r0", "epsilon", "sigma", "nn", "mm"])
class BondFENENM:
    """FENE backbone + generalized Mie n-m repulsion inside sigma
    (ref: src/EXTRA-MOLECULE/bond_fene_nm.cpp single())."""

    k: Array
    r0: Array
    epsilon: Array
    sigma: Array
    nn: Array
    mm: Array

    def energy_one(self, dx, t):
        rsq = jnp.sum(dx * dx)
        r0sq = self.r0[t] ** 2
        rlogarg = jnp.maximum(1.0 - rsq / r0sq, 0.02)
        e = -0.5 * self.k[t] * r0sq * jnp.log(rlogarg)
        r = jnp.sqrt(rsq)
        sr_n = (self.sigma[t] / r) ** self.nn[t]
        sr_m = (self.sigma[t] / r) ** self.mm[t]
        rep = (self.epsilon[t] / (self.nn[t] - self.mm[t])) * (
            self.mm[t] * sr_n - self.nn[t] * sr_m)
        return e + jnp.where(rsq < self.sigma[t] ** 2, rep, 0.0)


@_style(["k2", "theta0"])
class AngleMM3:
    """E = K dtheta^2 (1 - 0.802141 dt + 0.183837 dt^2 - 0.131664 dt^3
    + 0.237090 dt^4), dt in rad (ref: src/YAFF/angle_mm3.cpp:132).

    Explicit forces: the reference's de_angle uses 0.3239159 for the
    quartic-term coefficient where the exact energy gradient gives
    2.5*0.131664 = 0.329160 (angle_mm3.cpp:136) — replicated verbatim so
    the golden forces match."""

    k2: Array
    theta0: Array  # radians

    def compute(self, state, top, eflag, vflag):
        def fpair(d1, d2, t):
            rsq1 = jnp.sum(d1 * d1)
            rsq2 = jnp.sum(d2 * d2)
            r1r2 = jnp.sqrt(rsq1 * rsq2)
            c = jnp.clip(d1 @ d2 / r1r2, -1.0, 1.0)
            sinv = 1.0 / jnp.maximum(jnp.sqrt(1.0 - c * c), 0.001)
            dt = _acos_safe(c) - self.theta0[t]
            dt2 = dt * dt
            de = 2.0 * self.k2[t] * dt * (
                1.0 - 1.203211 * dt + 0.367674 * dt2
                - 0.3239159 * dt2 * dt + 0.711270 * dt2 * dt2)
            a = -de * sinv
            a11 = a * c / rsq1
            a12 = -a / r1r2
            a22 = a * c / rsq2
            f1 = a11 * d1 + a12 * d2
            f3 = a22 * d2 + a12 * d1
            e = self.k2[t] * dt2 * (1.0 - 0.802141 * dt + 0.183837 * dt2
                                    - 0.131664 * dt2 * dt
                                    + 0.237090 * dt2 * dt2)
            return f1, f3, e

        return _angle_explicit(fpair, state, top, eflag, vflag)


@_style(["angle_temp", "alpha", "width", "theta0g"])
class AngleGaussian:
    """E = -kB T ln( sum_i A_i/(w_i sqrt(pi/2)) e^{-2 dtheta^2/w_i^2} )
    (ref: src/EXTRA-MOLECULE/angle_gaussian.cpp)."""

    angle_temp: Array
    alpha: Array    # [ntypes+1, m]
    width: Array
    theta0g: Array  # radians

    def energy_one(self, d1, d2, t):
        theta = _acos_safe(_costheta(d1, d2))
        dt = theta - self.theta0g[t]
        logp = jnp.log(self.alpha[t] / (self.width[t]
                                        * jnp.sqrt(jnp.pi / 2.0)))
        expo = -2.0 * dt * dt / self.width[t] ** 2
        terms = logp + expo
        m = jnp.max(terms)
        logs = m + jnp.log(jnp.sum(jnp.exp(terms - m)))
        return -(_KB_REAL * self.angle_temp[t]) * logs


@_style(["theta0", "k2", "k3", "k4", "k5", "k6",
         "bb_k", "bb_r1", "bb_r2", "ba_k1", "ba_k2", "ba_r1", "ba_r2"])
class AngleClass2:
    """CLASS2 angle: quartic dtheta polynomial + bond-bond + bond-angle
    cross terms (ref: src/CLASS2/angle_class2.cpp:59-160). k5/k6 extend to
    the MOFFF class2/p6 sextic variant (src/MOFFF/angle_class2_p6.cpp:155);
    plain class2 has k5=k6=0."""

    theta0: Array  # radians
    k2: Array
    k3: Array
    k4: Array
    k5: Array
    k6: Array
    bb_k: Array
    bb_r1: Array
    bb_r2: Array
    ba_k1: Array
    ba_k2: Array
    ba_r1: Array
    ba_r2: Array

    def energy_one(self, d1, d2, t):
        r1 = _r(d1)
        r2 = _r(d2)
        dt = _acos_safe(_costheta(d1, d2)) - self.theta0[t]
        e = (self.k2[t] * dt**2 + self.k3[t] * dt**3 + self.k4[t] * dt**4
             + self.k5[t] * dt**5 + self.k6[t] * dt**6)
        e = e + self.bb_k[t] * (r1 - self.bb_r1[t]) * (r2 - self.bb_r2[t])
        e = e + (self.ba_k1[t] * (r1 - self.ba_r1[t])
                 + self.ba_k2[t] * (r2 - self.ba_r2[t])) * dt
        return e


@_style(["kf", "nf", "df"])
class DihedralFourier:
    """E = sum_j K_j (1 + cos(n_j phi - d_j))
    (ref: src/EXTRA-MOLECULE/dihedral_fourier.cpp); padded with K=0."""

    kf: Array  # [ntypes+1, m]
    nf: Array
    df: Array  # radians

    def energy_one(self, vb1, vb2, vb3, t):
        phi = _dihedral_phi(vb1, vb2, vb3)
        return jnp.sum(self.kf[t] * (1.0 + jnp.cos(self.nf[t] * phi
                                                   - self.df[t])))


@_style(["umin", "a", "cost", "sint", "opt1", "expand"])
class DihedralCosineShiftExp:
    """E = -Umin (e^{a U} - 1)/(e^a - 1), U = 0.5 (1 + cos(phi - theta0)),
    with the small-|a| Taylor branch (ref:
    src/EXTRA-MOLECULE/dihedral_cosine_shift_exp.cpp:150-158)."""

    umin: Array
    a: Array
    cost: Array
    sint: Array
    opt1: Array
    expand: Array  # bool per type: |a| < 0.001

    def energy_one(self, vb1, vb2, vb3, t):
        phi = _dihedral_phi(vb1, vb2, vb3)
        ccc = jnp.cos(phi) * self.cost[t] + jnp.sin(phi) * self.sint[t]
        e_exp = self.opt1[t] * (1.0 - jnp.exp(0.5 * self.a[t] * (1.0 + ccc)))
        e_tay = -0.125 * (1.0 + ccc) * (4.0 + self.a[t] * (ccc - 1.0)) \
            * self.umin[t]
        return jnp.where(self.expand[t] != 0.0, e_tay, e_exp)


def _unit(v):
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v), 1e-300))


@_style(["k", "chi"])
class ImproperDistance:
    """E = K d^2 + chi d^4, d the distance of the central atom 1 from the
    2-3-4 plane (ref: src/EXTRA-MOLECULE/improper_distance.cpp: normal of
    (x3-x2)x(x4-x2) projected on x2-x1)."""

    k: Array
    chi: Array

    def energy_one(self, vb1, vb2, vb3, t):
        # vb1 = x1-x2, vb2 = x3-x2, vb3 = x4-x3
        nhat = _unit(jnp.cross(vb2, vb2 + vb3))
        da = jnp.dot(nhat, -vb1)  # n . (x2-x1)... sign cancels in d^2/d^4
        return self.k[t] * da * da + self.chi[t] * da**4


@_style(["k", "chi"])
class ImproperDistharm:
    """E = K (d - d0)^2, d = -nhat.(x4-x1) with nhat from
    (x3-x2)x(x4-x3) (ref: src/YAFF/improper_distharm.cpp:141-144)."""

    k: Array
    chi: Array

    def energy_one(self, vb1, vb2, vb3, t):
        nhat = _unit(jnp.cross(vb2, vb3))
        da = -jnp.dot(nhat, vb2 + vb3 - vb1)
        dd = da - self.chi[t]
        return self.k[t] * dd * dd


@_style(["k", "chi"])
class ImproperSqdistharm:
    """E = K (d^2 - d0^2)^2 (ref: src/YAFF/improper_sqdistharm.cpp:143)."""

    k: Array
    chi: Array  # d0^2 directly (the coeff is passed through unmodified)

    def energy_one(self, vb1, vb2, vb3, t):
        nhat = _unit(jnp.cross(vb2, vb3))
        da = -jnp.dot(nhat, vb2 + vb3 - vb1)
        dd = da * da - self.chi[t]
        return self.k[t] * dd * dd


@_style(["k", "chi"])
class ImproperRing:
    """E = (1/6) K (sum over triads (cos theta - cos chi0))^6, triads
    (1,2,4), (1,2,3), (4,2,3) with the bend cos between at2-at1 and
    at3-at2 (ref: src/EXTRA-MOLECULE/improper_ring.cpp:140-176)."""

    k: Array
    chi: Array  # cos(chi0)

    def energy_one(self, vb1, vb2, vb3, t):
        # our vb1 = x1-x2, vb2 = x3-x2, vb3 = x4-x3
        def bend(b1, b2):
            return jnp.dot(b1, b2) / (_r(b1) * _r(b2))

        x42 = vb2 + vb3
        s = (bend(-vb1, x42) + bend(-vb1, vb2)
             + bend(-x42, vb2) - 3.0 * self.chi[t])
        return (1.0 / 6.0) * self.k[t] * s**6


@_style(["k", "c0", "c1", "c2", "allf"])
class ImproperFourier:
    """E = K (C0 + C1 s + C2 (2 s^2 - 1)) per wag term, where c is the
    cosine between the 1-2/1-3 plane normal and the 1-4 bond and s the
    sign-corrected sine; with all=1 the three bond permutations are summed
    (ref: src/EXTRA-MOLECULE/improper_fourier.cpp addone():150-185)."""

    k: Array
    c0: Array
    c1: Array
    c2: Array
    allf: Array

    def energy_one(self, vb1, vb2, vb3, t):
        # reference bonds all hang off atom 1:
        w1 = -vb1                # x2 - x1
        w2 = vb2 - vb1           # x3 - x1
        w3 = vb2 + vb3 - vb1     # x4 - x1

        def addone(a, b, h):
            nhat = _unit(jnp.cross(a, b))
            c = jnp.clip(jnp.dot(nhat, _unit(h)), -1.0, 1.0)
            s = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-12))
            proj = (jnp.dot(h, _unit(a)) + jnp.dot(h, _unit(b)))
            s = jnp.where(proj > 0.0, -s, s)
            return self.k[t] * (self.c0[t] + self.c1[t] * s
                                + self.c2[t] * (2.0 * s * s - 1.0))

        e1 = addone(w1, w2, w3)
        e_all = addone(w3, w1, w2) + addone(w2, w3, w1)
        return e1 + jnp.where(self.allf[t] != 0.0, e_all, 0.0)


@_style(["kw", "w0"])
class ImproperInversionHarmonic:
    """Wilson out-of-plane inversion: E = sum over the 3 branch
    permutations of K (omega - w0)^2, cos(omega) = |(rup, rum)| / |vb3|
    with up/um the unit bisectors of the other two bonds
    (ref: src/MOFFF/improper_inversion_harmonic.cpp invang())."""

    kw: Array
    w0: Array  # radians

    def energy_one(self, vb1, vb2, vb3, t):
        # reference bonds all hang off atom 1:
        w1 = -vb1
        w2 = vb2 - vb1
        w3 = vb2 + vb3 - vb1

        def invang(a, b, h):
            up = _unit(_unit(b) + _unit(a))
            um = _unit(_unit(b) - _unit(a))
            rup = jnp.dot(h, up)
            rum = jnp.dot(h, um)
            wwr = jnp.sqrt(rup * rup + rum * rum)
            cosom = jnp.minimum(wwr / _r(h), 1.0)
            dom = _acos_safe(cosom) - self.w0[t]
            return self.kw[t] * dom * dom

        return (invang(w3, w2, w1) + invang(w1, w3, w2)
                + invang(w2, w1, w3))


@_style([])
class BondZero:
    """bond/angle/dihedral/improper zero: no interaction
    (ref: src/bond_zero.cpp et al.)."""

    def energy_one(self, *args):
        return jnp.zeros(())


@_style([])
class AngleZero(BondZero):
    pass


@_style([])
class DihedralZero(BondZero):
    pass


@_style([])
class ImproperZero(BondZero):
    pass


# -- makers ------------------------------------------------------------------


def make_bond_gromos(ntypes, coeffs, dtype=jnp.float64):
    k, r0 = table(ntypes, coeffs, 2, dtype)
    return BondGromos(k=k, r0=r0)


def make_bond_morse(ntypes, coeffs, dtype=jnp.float64):
    d0, al, r0 = table(ntypes, coeffs, 3, dtype)
    return BondMorse(d0=d0, alpha=al, r0=r0)


def make_bond_nonlinear(ntypes, coeffs, dtype=jnp.float64):
    e, r0, lam = table(ntypes, coeffs, 3, dtype)
    return BondNonlinear(epsilon=e, r0=r0, lamda=lam)


def make_bond_class2(ntypes, coeffs, dtype=jnp.float64):
    r0, k2, k3, k4 = table(ntypes, coeffs, 4, dtype)
    return BondClass2(r0=r0, k2=k2, k3=k3, k4=k4)


def _hshift(ntypes, coeffs, dtype, cls):
    umin, r0, r1 = table(ntypes, coeffs, 3, dtype)
    denom = jnp.where(r0 == r1, 1.0, (r0 - r1) ** 2)
    return cls(k=umin / denom, r0=r0, r1=r1)


def make_bond_harmonic_shift(ntypes, coeffs, dtype=jnp.float64):
    return _hshift(ntypes, coeffs, dtype, BondHarmonicShift)


def make_bond_harmonic_shift_cut(ntypes, coeffs, dtype=jnp.float64):
    return _hshift(ntypes, coeffs, dtype, BondHarmonicShiftCut)


def make_bond_fene_expand(ntypes, coeffs, dtype=jnp.float64):
    k, r0, e, s, d = table(ntypes, coeffs, 5, dtype)
    return BondFENEExpand(k=k, r0=r0, epsilon=e, sigma=s, shift=d)


def make_angle_cosine_squared(ntypes, coeffs, dtype=jnp.float64):
    k, th = table(ntypes, coeffs, 2, dtype)
    return AngleCosineSquared(k=k, theta0=th * _D2R)


def make_angle_quartic(ntypes, coeffs, dtype=jnp.float64):
    th, k2, k3, k4 = table(ntypes, coeffs, 4, dtype)
    return AngleQuartic(theta0=th * _D2R, k2=k2, k3=k3, k4=k4)


def make_angle_cosine_delta(ntypes, coeffs, dtype=jnp.float64):
    k, th = table(ntypes, coeffs, 2, dtype)
    return AngleCosineDelta(k=k, theta0=th * _D2R)


def make_angle_cosine_periodic(ntypes, coeffs, dtype=jnp.float64):
    c, b, n = table(ntypes, coeffs, 3, dtype)
    n = jnp.maximum(n, 1.0)
    return AngleCosinePeriodic(k=c / (n * n), b=b, n=n)


def make_angle_fourier(ntypes, coeffs, dtype=jnp.float64):
    k, c0, c1, c2 = table(ntypes, coeffs, 4, dtype)
    return AngleFourier(k=k, c0=c0, c1=c1, c2=c2)


def make_angle_fourier_simple(ntypes, coeffs, dtype=jnp.float64):
    k, c, n = table(ntypes, coeffs, 3, dtype)
    return AngleFourierSimple(k=k, c=c, n=n)


def make_angle_cosine_shift(ntypes, coeffs, dtype=jnp.float64):
    u, th = table(ntypes, coeffs, 2, dtype)
    return AngleCosineShift(umin=u, theta0=th * _D2R)


def make_angle_cosine_shift_exp(ntypes, coeffs, dtype=jnp.float64):
    u, th, a = table(ntypes, coeffs, 3, dtype)
    a = jnp.where(a == 0.0, 1e-8, a)  # exact formula; a=0 limit regularized
    return AngleCosineShiftExp(umin=u, theta0=th * _D2R, a=a)


def make_dihedral_multi_harmonic(ntypes, coeffs, dtype=jnp.float64):
    a1, a2, a3, a4, a5 = table(ntypes, coeffs, 5, dtype)
    return DihedralMultiHarmonic(a1=a1, a2=a2, a3=a3, a4=a4, a5=a5)


def make_dihedral_nharmonic(ntypes, coeffs, dtype=jnp.float64):
    """coeff row: n A1 ... An (ref: dihedral_nharmonic.cpp coeff)."""
    nmax = max(int(c[0]) for c in coeffs.values())
    a = np.zeros((ntypes + 1, nmax))
    for t, c in coeffs.items():
        n = int(c[0])
        a[t, :n] = c[1:1 + n]
    return DihedralNHarmonic(a=jnp.asarray(a, dtype=dtype))


def make_dihedral_quadratic(ntypes, coeffs, dtype=jnp.float64):
    k, p0 = table(ntypes, coeffs, 2, dtype)
    return DihedralQuadratic(k=k, phi0=p0 * _D2R)


def make_dihedral_helix(ntypes, coeffs, dtype=jnp.float64):
    a, b, c = table(ntypes, coeffs, 3, dtype)
    return DihedralHelix(aphi=a, bphi=b, cphi=c)


def make_improper_cvff(ntypes, coeffs, dtype=jnp.float64):
    k, d, n = table(ntypes, coeffs, 3, dtype)
    return ImproperCvff(k=k, d=d, n=n)


def make_improper_cossq(ntypes, coeffs, dtype=jnp.float64):
    k, chi = table(ntypes, coeffs, 2, dtype)
    return ImproperCossq(k=k, chi0=chi * _D2R)


def make_improper_umbrella(ntypes, coeffs, dtype=jnp.float64):
    k, w0 = table(ntypes, coeffs, 2, dtype)
    w0r = w0 * _D2R
    s2 = jnp.sin(w0r) ** 2
    C = jnp.where(s2 > 0, k / jnp.where(s2 > 0, s2, 1.0), k)
    return ImproperUmbrella(k=k, w0=w0r, C=C)


# round-3 fixture-sweep makers


def _vartable(ntypes, rows, stride, dtype, lead=0):
    """rows[type] = (lead fixed cols..., n, then n groups of `stride`);
    returns (lead arrays, list of [ntypes+1, m] padded group arrays)."""
    m = max((int(r[lead]) for r in rows.values()), default=1)
    leads = np.zeros((lead, ntypes + 1))
    groups = np.zeros((stride, ntypes + 1, m))
    for t, r in rows.items():
        for li in range(lead):
            leads[li, t] = r[li]
        n = int(r[lead])
        for j in range(n):
            for si in range(stride):
                groups[si, t, j] = r[lead + 1 + stride * j + si]
    return ([jnp.asarray(leads[i], dtype=dtype) for i in range(lead)],
            [jnp.asarray(groups[i], dtype=dtype) for i in range(stride)])


def make_bond_gaussian(ntypes, coeffs, dtype=jnp.float64):
    (tempv,), (alpha, width, r0) = _vartable(ntypes, coeffs, 3, dtype,
                                             lead=1)
    width = jnp.where(alpha > 0, width, 1.0)  # padded rows: keep log finite
    return BondGaussian(bond_temp=tempv, alpha=alpha, width=width, r0g=r0)


def make_bond_mm3(ntypes, coeffs, dtype=jnp.float64):
    k2, r0 = table(ntypes, coeffs, 2, dtype)
    return BondMM3(k2=k2, r0=r0)


def make_bond_fene_nm(ntypes, coeffs, dtype=jnp.float64):
    k, r0, eps, sig, nn, mm = table(ntypes, coeffs, 6, dtype)
    return BondFENENM(k=k, r0=r0, epsilon=eps, sigma=sig, nn=nn, mm=mm)


def make_angle_mm3(ntypes, coeffs, dtype=jnp.float64):
    k2, th0 = table(ntypes, coeffs, 2, dtype)
    return AngleMM3(k2=k2, theta0=th0 * _D2R)


def make_angle_gaussian(ntypes, coeffs, dtype=jnp.float64):
    (tempv,), (alpha, width, th0) = _vartable(ntypes, coeffs, 3, dtype,
                                              lead=1)
    width = jnp.where(alpha > 0, width, 1.0)
    return AngleGaussian(angle_temp=tempv, alpha=alpha, width=width,
                         theta0g=th0 * _D2R)


def make_angle_class2(ntypes, main, bb, ba, dtype=jnp.float64, p6=False):
    """main[t] = (theta0_deg, k2, k3, k4[, k5, k6]); bb[t] = (M, r1, r2);
    ba[t] = (N1, N2, r1, r2) (ref: angle_class2.cpp coeff() 3-part form)."""
    ncols = 6 if p6 else 4
    cols = table(ntypes, main, ncols, dtype)
    th0, k2, k3, k4 = cols[0], cols[1], cols[2], cols[3]
    z = jnp.zeros_like(k2)
    k5, k6 = (cols[4], cols[5]) if p6 else (z, z)
    bbk, bbr1, bbr2 = table(ntypes, bb, 3, dtype)
    bak1, bak2, bar1, bar2 = table(ntypes, ba, 4, dtype)
    return AngleClass2(theta0=th0 * _D2R, k2=k2, k3=k3, k4=k4, k5=k5, k6=k6,
                       bb_k=bbk, bb_r1=bbr1, bb_r2=bbr2,
                       ba_k1=bak1, ba_k2=bak2, ba_r1=bar1, ba_r2=bar2)


def make_dihedral_fourier(ntypes, coeffs, dtype=jnp.float64):
    _, (kf, nf, df) = _vartable(ntypes, coeffs, 3, dtype, lead=0)
    return DihedralFourier(kf=kf, nf=nf, df=df * _D2R)


def make_dihedral_cosine_shift_exp(ntypes, coeffs, dtype=jnp.float64):
    umin, th0, a = table(ntypes, coeffs, 3, dtype)
    th0r = th0 * _D2R
    expand = (jnp.abs(a) < 0.001).astype(umin.dtype)
    safe_a = jnp.where(expand != 0.0, 1.0, a)
    opt1 = umin / (jnp.exp(safe_a) - 1.0)
    return DihedralCosineShiftExp(umin=umin, a=a, cost=jnp.cos(th0r),
                                  sint=jnp.sin(th0r), opt1=opt1,
                                  expand=expand)


def make_improper_distance(ntypes, coeffs, dtype=jnp.float64):
    k, chi = table(ntypes, coeffs, 2, dtype)
    return ImproperDistance(k=k, chi=chi)


def make_improper_distharm(ntypes, coeffs, dtype=jnp.float64):
    k, chi = table(ntypes, coeffs, 2, dtype)
    return ImproperDistharm(k=k, chi=chi)


def make_improper_sqdistharm(ntypes, coeffs, dtype=jnp.float64):
    k, chi = table(ntypes, coeffs, 2, dtype)
    return ImproperSqdistharm(k=k, chi=chi)


def make_improper_ring(ntypes, coeffs, dtype=jnp.float64):
    k, chi0 = table(ntypes, coeffs, 2, dtype)
    return ImproperRing(k=k, chi=jnp.cos(chi0 * _D2R))


def make_improper_fourier(ntypes, coeffs, dtype=jnp.float64):
    # narg 4 or 5: K C0 C1 C2 [all]
    full = {t: (tuple(c) + (1.0,))[:5] for t, c in coeffs.items()}
    k, c0, c1, c2, allf = table(ntypes, full, 5, dtype)
    return ImproperFourier(k=k, c0=c0, c1=c1, c2=c2, allf=allf)


def make_improper_inversion_harmonic(ntypes, coeffs, dtype=jnp.float64):
    kw, w0 = table(ntypes, coeffs, 2, dtype)
    # K/3: threefold branch averaging (improper_inversion_harmonic.cpp:293)
    return ImproperInversionHarmonic(kw=kw / 3.0, w0=w0 * _D2R)


# -- tabulated bond/angle styles ----------------------------------------------


def _bonded_table_arrays(rfile, efile, ffile, params, tablength,
                         tabstyle, lo=None, hi=None):
    """BondTable/AngleTable compute_table: resample the file data onto
    tablength uniform points in r (or theta) with NR splines
    (ref: src/MOLECULE/bond_table.cpp:360-420, angle_table.cpp:455-500)."""
    from .pair_extra import _nr_spline, _nr_splint

    n = len(rfile)
    ep0, epn = -ffile[0], -ffile[n - 1]
    e2file = _nr_spline(rfile, efile, ep0, epn)
    if params.get("fpflag"):
        fplo, fphi = params["fplo"], params["fphi"]
    else:
        fplo = (ffile[1] - ffile[0]) / (rfile[1] - rfile[0])
        fphi = (ffile[n - 1] - ffile[n - 2]) / (rfile[n - 1] - rfile[n - 2])
    f2file = _nr_spline(rfile, ffile, fplo, fphi)
    lo = rfile[0] if lo is None else lo
    hi = rfile[-1] if hi is None else hi
    tlm1 = tablength - 1
    delta = (hi - lo) / tlm1
    r = lo + np.arange(tablength) * delta
    e = _nr_splint(rfile, efile, e2file, r)
    f = _nr_splint(rfile, ffile, f2file, r)
    de = np.empty(tablength)
    df = np.empty(tablength)
    de[:-1] = np.diff(e)
    df[:-1] = np.diff(f)
    de[-1] = 2.0 * de[-2] - de[-3]
    df[-1] = 2.0 * df[-2] - df[-3]
    e2 = _nr_spline(r, e, -f[0], -f[tlm1])
    f2 = _nr_spline(r, f, fplo, fphi)
    return dict(lo=lo, delta=delta, invdelta=1.0 / delta,
                deltasq6=delta * delta / 6.0, r=r, e=e, f=f, de=de,
                df=df, e2=e2, f2=f2)


def _uf_lookup(tabs, tabstyle, t, x):
    """uf_lookup over stacked per-type tables (jnp; ref:
    bond_table.cpp uf_lookup / angle_table.cpp uf_lookup)."""
    lo = tabs["lo"][t]
    invd = tabs["invdelta"][t]
    n = tabs["r"].shape[1]
    it = jnp.clip(((x - lo) * invd).astype(jnp.int32), 0, n - 2)
    ri = tabs["r"][t, it]
    if tabstyle == "linear":
        frac = (x - ri) * invd
        u = tabs["e"][t, it] + frac * tabs["de"][t, it]
        f = tabs["f"][t, it] + frac * tabs["df"][t, it]
    else:  # spline
        b = (x - ri) * invd
        a = 1.0 - b
        d6 = tabs["deltasq6"][t]
        u = (a * tabs["e"][t, it] + b * tabs["e"][t, it + 1]
             + ((a**3 - a) * tabs["e2"][t, it]
                + (b**3 - b) * tabs["e2"][t, it + 1]) * d6)
        f = (a * tabs["f"][t, it] + b * tabs["f"][t, it + 1]
             + ((a**3 - a) * tabs["f2"][t, it]
                + (b**3 - b) * tabs["f2"][t, it + 1]) * d6)
    return u, f


@partial(jax.tree_util.register_dataclass, data_fields=["tabs"],
         meta_fields=["tabstyle"])
@dataclasses.dataclass(frozen=True)
class BondTableStyle:
    """bond_style table linear|spline N (ref: src/MOLECULE/bond_table.cpp:
    force from the tabulated -dE/dr, fbond = f/r)."""

    tabs: dict  # stacked [ntypes+1, tablength] arrays
    tabstyle: str

    def compute(self, state, top, eflag, vflag):
        arr = top.bonds
        t = arr[:, 0]
        i, j = arr[:, 1], arr[:, 2]
        cap = state.capacity
        valid = t > 0
        ii = jnp.clip(i, 0, cap - 1)
        jj = jnp.clip(j, 0, cap - 1)
        dx = state.box.min_image(state.x[ii] - state.x[jj])
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        r = jnp.where(valid, r, self.tabs["lo"][1] + 1e-3)
        u, fr = _uf_lookup(self.tabs, self.tabstyle, t, r)
        fbond = jnp.where(valid, fr / r, 0.0)
        fi = dx * fbond[:, None]
        f = jnp.zeros_like(state.x)
        f = f.at[i].add(fi, mode="drop")
        f = f.at[j].add(-fi, mode="drop")
        energy = jnp.sum(jnp.where(valid, u, 0.0)) if eflag else None
        virial = None
        if vflag:
            m = jnp.einsum("na,nb->ab", dx, fi)
            virial = jnp.array([m[0, 0], m[1, 1], m[2, 2],
                                m[0, 1], m[0, 2], m[1, 2]])
        return f, energy, virial


@partial(jax.tree_util.register_dataclass, data_fields=["tabs"],
         meta_fields=["tabstyle"])
@dataclasses.dataclass(frozen=True)
class AngleTableStyle:
    """angle_style table linear|spline N (ref: src/MOLECULE/
    angle_table.cpp: mdu = -dE/dtheta lookup, a = mdu/sin(theta))."""

    tabs: dict
    tabstyle: str

    def compute(self, state, top, eflag, vflag):
        def fpair(d1, d2, t):
            rsq1 = jnp.sum(d1 * d1)
            rsq2 = jnp.sum(d2 * d2)
            r1r2 = jnp.sqrt(rsq1 * rsq2)
            c = jnp.clip(d1 @ d2 / r1r2, -1.0, 1.0)
            sinv = 1.0 / jnp.maximum(jnp.sqrt(1.0 - c * c), 0.001)
            theta = _acos_safe(c)
            u, mdu = _uf_lookup(self.tabs, self.tabstyle, t, theta)
            a = mdu * sinv
            a11 = a * c / rsq1
            a12 = -a / r1r2
            a22 = a * c / rsq2
            f1 = a11 * d1 + a12 * d2
            f3 = a22 * d2 + a12 * d1
            return f1, f3, u

        return _angle_explicit(fpair, state, top, eflag, vflag)


def _stack_tables(per_type: dict, ntypes: int, dtype):
    keys = ("lo", "delta", "invdelta", "deltasq6", "r", "e", "f", "de",
            "df", "e2", "f2")
    some = next(iter(per_type.values()))
    out = {}
    for k in keys:
        val = np.asarray(some[k])
        shape = (ntypes + 1,) + val.shape
        arr = np.zeros(shape)
        if val.ndim == 0:
            arr[:] = 1.0 if k in ("invdelta", "delta", "deltasq6") else 0.0
        for t, tb in per_type.items():
            arr[t] = tb[k]
        out[k] = jnp.asarray(arr, dtype=dtype)
    return out


def make_bond_table(ntypes, rows, tabstyle, tablength, dtype=jnp.float64):
    """rows[type] = (file, keyword)."""
    from .pair_extra import read_pair_table

    per = {}
    for t, (fpath, key) in rows.items():
        rfile, efile, ffile, params = read_pair_table(fpath, key)
        per[t] = _bonded_table_arrays(rfile, efile, ffile, params,
                                      tablength, tabstyle)
    return BondTableStyle(tabs=_stack_tables(per, ntypes, dtype),
                          tabstyle=tabstyle)


def make_angle_table(ntypes, rows, tabstyle, tablength, dtype=jnp.float64):
    from .pair_extra import read_pair_table

    per = {}
    for t, (fpath, key) in rows.items():
        afile, efile, ffile, params = read_pair_table(fpath, key)
        afile = np.deg2rad(afile)
        ffile = ffile * (180.0 / np.pi)  # energy/deg -> energy/rad
        params = dict(params)
        if params.get("fpflag"):
            params["fplo"] *= (180.0 / np.pi) ** 2
            params["fphi"] *= (180.0 / np.pi) ** 2
        per[t] = _bonded_table_arrays(afile, efile, ffile, params,
                                      tablength, tabstyle,
                                      lo=0.0, hi=np.pi)
    return AngleTableStyle(tabs=_stack_tables(per, ntypes, dtype),
                           tabstyle=tabstyle)


@partial(jax.tree_util.register_dataclass, data_fields=["styles", "masks"],
         meta_fields=["kind"])
@dataclasses.dataclass(frozen=True)
class HybridBonded:
    """bond/angle/dihedral/improper hybrid: route each interaction type to
    its sub-style (ref: src/bond_hybrid.cpp et al. — per-style bondlists;
    here each sub-style sees the topology with foreign types zeroed)."""

    styles: tuple   # sub-style objects
    masks: tuple    # per-style [ntypes+1] bool arrays (type -> belongs)
    kind: str       # "bonds" | "angles" | "dihedrals" | "impropers"

    def compute(self, state, top, eflag, vflag):
        from . import bonded as bonded_mod

        arr = getattr(top, self.kind)
        f_tot = jnp.zeros_like(state.x)
        e_tot = jnp.zeros((), state.dtype) if eflag else None
        v_tot = jnp.zeros(6, dtype=state.dtype) if vflag else None
        for style, mask in zip(self.styles, self.masks):
            t = arr[:, 0]
            keep = mask[jnp.clip(t, 0, mask.shape[0] - 1)]
            arr2 = arr.at[:, 0].set(jnp.where(keep, t, 0))
            top2 = dataclasses.replace(top, **{self.kind: arr2})
            if self.kind == "bonds":
                out = bonded_mod.compute_bonds(style, state, top2, eflag,
                                               vflag)
            elif self.kind == "angles":
                out = bonded_mod.compute_angles(style, state, top2, eflag,
                                                vflag)
            else:
                out = bonded_mod.compute_dihedrals(
                    style, state, top2, eflag, vflag, which=self.kind)[:3]
            if out is None:
                continue
            fs, es, vs = out[0], out[1], out[2]
            f_tot = f_tot + fs
            if eflag and es is not None:
                e_tot = e_tot + es
            if vflag and vs is not None:
                v_tot = v_tot + vs
        return f_tot, e_tot, v_tot


# ---------------------------------------------------------------------------
# Round-3 wave: quartic / restrain / cross / class2 torsions / spherical /
# Lepton expression styles. Same autodiff-energy design: each class states
# the reference's energy expression only; forces and virial come from the
# generic engines in bonded.py.
# ---------------------------------------------------------------------------


@_style(["k", "b1", "b2", "rc", "u0"])
class BondQuartic:
    """E = K dr^2 (dr-B1)(dr-B2) + U0 (+ shifted WCA at eps=sigma=1 inside
    2^(1/6)); dr = r - Rc. Bonds stretched past Rc are broken and
    contribute nothing (ref: src/MOLECULE/bond_quartic.cpp:86-116; the
    pair->single subtraction there vanishes under the fixture's pair
    zero).

    Single-point / pair-zero ONLY (the fixture protocol): the reference
    breaks a bond PERMANENTLY by zeroing its type (bond_quartic.cpp:104)
    and subtracts the overlapping pair interaction; this evaluates the
    r<=Rc criterion per call and subtracts nothing, so it is not wired
    into the deck interpreter — dynamic use would need broken-bond state
    in the topology and the pair->single subtraction."""

    k: Array
    b1: Array
    b2: Array
    rc: Array
    u0: Array

    def energy_one(self, dx, t):
        rsq = jnp.sum(dx * dx)
        r = jnp.sqrt(jnp.maximum(rsq, 1e-30))
        dr = r - self.rc[t]
        e = (self.k[t] * dr * dr * (dr - self.b1[t]) * (dr - self.b2[t])
             + self.u0[t])
        sr2 = 1.0 / jnp.maximum(rsq, 1e-12)
        sr6 = sr2 * sr2 * sr2
        e_wca = 4.0 * sr6 * (sr6 - 1.0) + 1.0
        e = e + jnp.where(rsq < 2.0 ** (1.0 / 3.0), e_wca, 0.0)
        return jnp.where(r <= self.rc[t], e, 0.0)


@_style(["k", "r0"])
class BondHarmonicRestrain:
    """E = K (r - r0)^2 with r0 the PER-BOND length at setup time
    (ref: src/EXTRA-MOLECULE/bond_harmonic_restrain.cpp:68-97 reads x0
    from a stored snapshot of the setup coordinates)."""

    k: Array   # [ntypes+1]
    r0: Array  # [nbonds] per-row initial bond length

    def compute(self, state, top, eflag, vflag):
        arr = top.bonds
        t = arr[:, 0]
        i, j = arr[:, 1], arr[:, 2]
        cap = state.capacity
        valid = t > 0
        dx = state.box.min_image(state.x[jnp.clip(i, 0, cap - 1)]
                                 - state.x[jnp.clip(j, 0, cap - 1)])
        r = jnp.sqrt(jnp.maximum(jnp.sum(dx * dx, axis=-1), 1e-30))
        dr = r - self.r0
        rk = self.k[t] * dr
        fbond = jnp.where(valid, -2.0 * rk / r, 0.0)
        fi = dx * fbond[:, None]
        f = jnp.zeros_like(state.x)
        f = f.at[i].add(fi, mode="drop")
        f = f.at[j].add(-fi, mode="drop")
        energy = jnp.sum(jnp.where(valid, rk * dr, 0.0)) if eflag else None
        virial = None
        if vflag:
            m = jnp.einsum("na,nb->ab", dx, fi)
            virial = jnp.array([m[0, 0], m[1, 1], m[2, 2],
                                m[0, 1], m[0, 2], m[1, 2]])
        return f, energy, virial


@_style(["kss", "kbs0", "kbs1", "r00", "r01", "theta0"])
class AngleCross:
    """YAFF cross term: E = Kss dr1 dr2 + Kbs0 dr1 dtheta + Kbs1 dr2
    dtheta (ref: src/YAFF/angle_cross.cpp:115-170)."""

    kss: Array
    kbs0: Array
    kbs1: Array
    r00: Array
    r01: Array
    theta0: Array  # radians

    def energy_one(self, d1, d2, t):
        r1 = _r(d1)
        r2 = _r(d2)
        dr1 = r1 - self.r00[t]
        dr2 = r2 - self.r01[t]
        dt = _acos_safe(_costheta(d1, d2)) - self.theta0[t]
        return (self.kss[t] * dr1 * dr2
                + self.kbs0[t] * dr1 * dt + self.kbs1[t] * dr2 * dt)


def _phi_class2(vb1, vb2, vb3):
    """CLASS2 dihedral angle: phi = acos((c0 + c12 c23)/(s12 s23)),
    negated when (vb1 x vb2) . vb3 > 0
    (ref: src/CLASS2/dihedral_class2.cpp:177-231)."""
    r1 = _r(vb1)
    r2 = _r(vb2)
    r3 = _r(vb3)
    c0 = jnp.dot(vb1, vb3) / (r1 * r3)
    c12 = jnp.clip(jnp.dot(vb1, vb2) / (r1 * r2), -1.0, 1.0)
    c23 = jnp.clip(-jnp.dot(vb2, vb3) / (r2 * r3), -1.0, 1.0)
    sc1 = jnp.sqrt(jnp.maximum(1.0 - c12 * c12, 1e-16))
    sc2 = jnp.sqrt(jnp.maximum(1.0 - c23 * c23, 1e-16))
    c = (c0 + c12 * c23) / (sc1 * sc2)
    phi = _acos_safe(c)
    flip = jnp.dot(jnp.cross(vb1, vb2), vb3) > 0.0
    return jnp.where(flip, -phi, phi), c12, c23, r1, r2, r3


@_style(["main", "mbt", "ebt", "at", "aat", "bb13"])
class DihedralClass2:
    """CLASS2 torsion with all five cross couplings
    (ref: src/CLASS2/dihedral_class2.cpp:269-505):
      E = sum_i K_i (1 - cos(i phi - phi_i))
        + (r2-r2_0) sum_i A_i cos(i phi)              [mbt]
        + (r1-r1_0) sum_i B_i cos(i phi)
          + (r3-r3_0) sum_i C_i cos(i phi)            [ebt]
        + (th1-th1_0) sum_i D_i cos(i phi)
          + (th2-th2_0) sum_i E_i cos(i phi)          [at]
        + M (th1-th1_0')(th2-th2_0') cos phi          [aat]
        + N (r1-r1_0'')(r3-r3_0'')                    [bb13]"""

    main: Array  # [nt+1, 6]: K1 phi1 K2 phi2 K3 phi3 (rad)
    mbt: Array   # [nt+1, 4]: A1 A2 A3 r2_0
    ebt: Array   # [nt+1, 8]: B1 B2 B3 C1 C2 C3 r1_0 r3_0
    at: Array    # [nt+1, 8]: D1 D2 D3 E1 E2 E3 th1_0 th2_0 (rad)
    aat: Array   # [nt+1, 3]: M th1_0 th2_0 (rad)
    bb13: Array  # [nt+1, 3]: N r1_0 r3_0

    def energy_one(self, vb1, vb2, vb3, t):
        phi, c12, c23, r1, r2, r3 = _phi_class2(vb1, vb2, vb3)
        th1 = _acos_safe(c12)
        th2 = _acos_safe(c23)
        m = self.main[t]
        e = (m[0] * (1.0 - jnp.cos(phi - m[1]))
             + m[2] * (1.0 - jnp.cos(2.0 * phi - m[3]))
             + m[4] * (1.0 - jnp.cos(3.0 * phi - m[5])))
        cphi = jnp.cos(phi)
        c2phi = jnp.cos(2.0 * phi)
        c3phi = jnp.cos(3.0 * phi)
        mb = self.mbt[t]
        e = e + (r2 - mb[3]) * (mb[0] * cphi + mb[1] * c2phi
                                + mb[2] * c3phi)
        eb = self.ebt[t]
        e = e + (r1 - eb[6]) * (eb[0] * cphi + eb[1] * c2phi
                                + eb[2] * c3phi)
        e = e + (r3 - eb[7]) * (eb[3] * cphi + eb[4] * c2phi
                                + eb[5] * c3phi)
        a = self.at[t]
        e = e + (th1 - a[6]) * (a[0] * cphi + a[1] * c2phi + a[2] * c3phi)
        e = e + (th2 - a[7]) * (a[3] * cphi + a[4] * c2phi + a[5] * c3phi)
        aa = self.aat[t]
        e = e + aa[0] * (th1 - aa[1]) * (th2 - aa[2]) * cphi
        bb = self.bb13[t]
        e = e + bb[0] * (r1 - bb[1]) * (r3 - bb[2])
        return e


@_style(["k0", "chi0", "aa_k1", "aa_k2", "aa_k3",
         "aa_t1", "aa_t2", "aa_t3"])
class ImproperClass2:
    """CLASS2 Wilson out-of-plane improper: chi is the average of the
    three asin'd out-of-plane projections, E = K (chi - chi0)^2, plus the
    angle-angle coupling E_aa = M2 dthABC dthABD + M1 dthABC dthCBD +
    M3 dthABD dthCBD (ref: src/CLASS2/improper_class2.cpp:139-210 and
    angleangle() at :620-680)."""

    k0: Array
    chi0: Array  # radians
    aa_k1: Array
    aa_k2: Array
    aa_k3: Array
    aa_t1: Array  # theta0 ABC (rad)
    aa_t2: Array  # theta0 ABD (rad)
    aa_t3: Array  # theta0 CBD (rad)

    def energy_one(self, vb1, vb2, vb3, t):
        # delr0 = x1-x2 (AB), delr1 = x3-x2 (CB), delr2 = x4-x2 (DB)
        d0, d1, d2 = vb1, vb2, vb2 + vb3
        r0 = _r(d0)
        r1 = _r(d1)
        r2 = _r(d2)
        ctABC = jnp.clip(jnp.dot(d0, d1) / (r0 * r1), -1.0, 1.0)
        ctCBD = jnp.clip(jnp.dot(d1, d2) / (r1 * r2), -1.0, 1.0)
        ctABD = jnp.clip(jnp.dot(d0, d2) / (r0 * r2), -1.0, 1.0)
        thABC = _acos_safe(ctABC)
        thCBD = _acos_safe(ctCBD)
        thABD = _acos_safe(ctABD)
        inv3r = 1.0 / jnp.maximum(r0 * r1 * r2, 1e-30)
        s_lim = 1.0 - 1e-12
        sABCD = jnp.clip(jnp.dot(jnp.cross(d1, d2), d0) * inv3r
                         / jnp.maximum(jnp.sin(thCBD), 1e-12),
                         -s_lim, s_lim)
        sCBDA = jnp.clip(jnp.dot(jnp.cross(d2, d0), d1) * inv3r
                         / jnp.maximum(jnp.sin(thABD), 1e-12),
                         -s_lim, s_lim)
        sDBAC = jnp.clip(jnp.dot(jnp.cross(d0, d1), d2) * inv3r
                         / jnp.maximum(jnp.sin(thABC), 1e-12),
                         -s_lim, s_lim)
        chi = (jnp.arcsin(sABCD) + jnp.arcsin(sCBDA)
               + jnp.arcsin(sDBAC)) / 3.0
        dchi = chi - self.chi0[t]
        e = self.k0[t] * dchi * dchi
        dABC = thABC - self.aa_t1[t]
        dABD = thABD - self.aa_t2[t]
        dCBD = thCBD - self.aa_t3[t]
        return (e + self.aa_k2[t] * dABC * dABD
                + self.aa_k1[t] * dABC * dCBD
                + self.aa_k3[t] * dABD * dCBD)


def _phi_02pi(vb1, vb2, vb3):
    """Dihedral angle in [0, 2pi): phi = acos(-n123.n234), negated and
    shifted by 2pi when n123.vb34 > 0, with n123 = vb23 x vb12 and
    n234 = vb23 x vb34 (ref: dihedral_spherical.cpp Phi() /
    dihedral_lepton.cpp get_phi(); here vb12 = -vb1, vb23 = vb2,
    vb34 = vb3)."""
    n123 = jnp.cross(vb2, -vb1)
    n234 = jnp.cross(vb2, vb3)
    denom = jnp.sqrt(jnp.maximum(
        jnp.sum(n123 * n123) * jnp.sum(n234 * n234), 1e-30))
    c = -jnp.dot(n123, n234) / denom
    phi = _acos_safe(c)
    flip = jnp.dot(n123, vb3) > 0.0
    return jnp.where(flip, 2.0 * jnp.pi - phi, phi)


@_style(["c", "pm", "ps", "po", "t1m", "t1s", "t1o", "t2m", "t2s", "t2o"])
class DihedralSpherical:
    """E = sum_j C_j (po_j - cos(pm_j (phi - ps_j)))
                  (t1o_j - cos(t1m_j (th1 - t1s_j)))
                  (t2o_j - cos(t2m_j (th2 - t2s_j)))
    with phi in [0, 2pi), th1 = angle(1-2-3), th2 = angle(2-3-4)
    (ref: src/EXTRA-MOLECULE/dihedral_spherical.cpp:545-584). Padded
    terms have C_j = 0."""

    c: Array    # [nt+1, m]
    pm: Array
    ps: Array   # rad
    po: Array
    t1m: Array
    t1s: Array  # rad
    t1o: Array
    t2m: Array
    t2s: Array  # rad
    t2o: Array

    def energy_one(self, vb1, vb2, vb3, t):
        r1 = _r(vb1)
        r2 = _r(vb2)
        r3 = _r(vb3)
        th1 = _acos_safe(jnp.dot(vb1, vb2) / (r1 * r2))
        th2 = _acos_safe(-jnp.dot(vb2, vb3) / (r2 * r3))
        phi = _phi_02pi(vb1, vb2, vb3)
        fp = self.po[t] - jnp.cos(self.pm[t] * (phi - self.ps[t]))
        f1 = self.t1o[t] - jnp.cos(self.t1m[t] * (th1 - self.t1s[t]))
        f2 = self.t2o[t] - jnp.cos(self.t2m[t] * (th2 - self.t2s[t]))
        return jnp.sum(self.c[t] * fp * f1 * f2)


# -- Lepton expression styles (ref: src/LEPTON/{bond,angle,dihedral}_lepton
# .cpp): per-type algebraic strings compiled by utils/lepton.py; the
# reference evaluates a symbolic derivative, autodiff gives the same
# values. E is offset so that E(0) = 0 (auto_offset default). -------------


@partial(jax.tree_util.register_dataclass, data_fields=["r0"],
         meta_fields=["fns"])
@dataclasses.dataclass(frozen=True)
class BondLepton:
    """bond_coeff t r0 "expr(r)" with r the deviation from r0
    (ref: src/LEPTON/bond_lepton.cpp:112-140)."""

    r0: Array
    fns: tuple  # fns[t] = (callable, offset) or None

    def energy_one(self, dx, t):
        dr = _r(dx) - self.r0[t]
        e = jnp.zeros((), dr.dtype)
        for tt in range(1, len(self.fns)):
            if self.fns[tt] is None:
                continue
            fn, off = self.fns[tt]
            e = e + jnp.where(t == tt, fn(r=dr) - off, 0.0)
        return e


@partial(jax.tree_util.register_dataclass, data_fields=["theta0"],
         meta_fields=["fns"])
@dataclasses.dataclass(frozen=True)
class AngleLepton:
    """angle_coeff t theta0_deg "expr(theta)" with theta the deviation in
    radians (ref: src/LEPTON/angle_lepton.cpp:143-183)."""

    theta0: Array  # radians
    fns: tuple

    def energy_one(self, d1, d2, t):
        dth = _acos_safe(_costheta(d1, d2)) - self.theta0[t]
        e = jnp.zeros((), dth.dtype)
        for tt in range(1, len(self.fns)):
            if self.fns[tt] is None:
                continue
            fn, off = self.fns[tt]
            e = e + jnp.where(t == tt, fn(theta=dth) - off, 0.0)
        return e


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["fns"])
@dataclasses.dataclass(frozen=True)
class DihedralLepton:
    """dihedral_coeff t "expr(phi)", phi in [0, 2pi)
    (ref: src/LEPTON/dihedral_lepton.cpp:174-230)."""

    fns: tuple

    def energy_one(self, vb1, vb2, vb3, t):
        phi = _phi_02pi(vb1, vb2, vb3)
        e = jnp.zeros((), phi.dtype)
        for tt in range(1, len(self.fns)):
            if self.fns[tt] is None:
                continue
            fn, _off = self.fns[tt]
            e = e + jnp.where(t == tt, fn(phi=phi), 0.0)
        return e


def make_bond_quartic(ntypes, coeffs, dtype=jnp.float64):
    k, b1, b2, rc, u0 = table(ntypes, coeffs, 5, dtype)
    return BondQuartic(k=k, b1=b1, b2=b2, rc=rc, u0=u0)


def make_bond_harmonic_restrain(ntypes, coeffs, state, top,
                                dtype=jnp.float64):
    """r0 snapshot from the CURRENT coordinates (setup time)."""
    (k,) = table(ntypes, coeffs, 1, dtype)
    arr = top.bonds
    cap = state.capacity
    dx = state.box.min_image(
        state.x[jnp.clip(arr[:, 1], 0, cap - 1)]
        - state.x[jnp.clip(arr[:, 2], 0, cap - 1)])
    r0 = jnp.sqrt(jnp.maximum(jnp.sum(dx * dx, axis=-1), 1e-30))
    return BondHarmonicRestrain(k=k, r0=jnp.asarray(r0, dtype=dtype))


def make_angle_cross(ntypes, coeffs, dtype=jnp.float64):
    kss, kbs0, kbs1, r00, r01, th0 = table(ntypes, coeffs, 6, dtype)
    return AngleCross(kss=kss, kbs0=kbs0, kbs1=kbs1, r00=r00, r01=r01,
                      theta0=th0 * _D2R)


def make_dihedral_class2(ntypes, main, mbt, ebt, at, aat, bb13,
                         dtype=jnp.float64):
    """Each dict maps type -> coeff tuple in the reference's coeff()
    order (ref: dihedral_class2.cpp coeff(): main K1 phi1 K2 phi2 K3
    phi3 [deg]; mbt A1 A2 A3 r2; ebt B1 B2 B3 C1 C2 C3 r1 r3;
    at D1 D2 D3 E1 E2 E3 th1 th2 [deg]; aat M th1 th2 [deg];
    bb13 N r1 r3)."""
    def stack(d, ncols, deg_idx=()):
        out = np.zeros((ntypes + 1, ncols))
        for t, c in d.items():
            out[t, :len(c)] = c
        for i in deg_idx:
            out[:, i] *= _D2R
        return jnp.asarray(out, dtype=dtype)

    return DihedralClass2(
        main=stack(main, 6, deg_idx=(1, 3, 5)),
        mbt=stack(mbt, 4),
        ebt=stack(ebt, 8),
        at=stack(at, 8, deg_idx=(6, 7)),
        aat=stack(aat, 3, deg_idx=(1, 2)),
        bb13=stack(bb13, 3),
    )


def make_improper_class2(ntypes, main, aa, dtype=jnp.float64):
    """main[t] = (K, chi0_deg); aa[t] = (M1, M2, M3, th1, th2, th3 deg)
    (ref: improper_class2.cpp coeff())."""
    k0 = np.zeros(ntypes + 1)
    chi0 = np.zeros(ntypes + 1)
    for t, c in main.items():
        k0[t], chi0[t] = c[0], c[1] * _D2R
    aak = np.zeros((ntypes + 1, 6))
    for t, c in aa.items():
        aak[t] = c
    aak[:, 3:] *= _D2R
    asj = lambda a: jnp.asarray(a, dtype=dtype)
    return ImproperClass2(k0=asj(k0), chi0=asj(chi0),
                          aa_k1=asj(aak[:, 0]), aa_k2=asj(aak[:, 1]),
                          aa_k3=asj(aak[:, 2]), aa_t1=asj(aak[:, 3]),
                          aa_t2=asj(aak[:, 4]), aa_t3=asj(aak[:, 5]))


def make_dihedral_spherical(ntypes, coeffs, dtype=jnp.float64):
    """coeffs[t] = (nterms, then per term: C pm ps po t1m t1s t1o t2m
    t2s t2o), shifts in degrees (ref: dihedral_spherical.cpp coeff())."""
    _, groups = _vartable(ntypes, coeffs, 10, dtype, lead=0)
    c, pm, ps, po, t1m, t1s, t1o, t2m, t2s, t2o = groups
    return DihedralSpherical(c=c, pm=pm, ps=ps * _D2R, po=po,
                             t1m=t1m, t1s=t1s * _D2R, t1o=t1o,
                             t2m=t2m, t2s=t2s * _D2R, t2o=t2o)


def _lepton_fns(rows, ntypes, extra_lead=0, var="r", offset=True):
    """rows: list of shlex-split coeff tokens [type, (lead...), expr].
    Returns (lead float array [nt+1], fns tuple with offsets). `offset`
    mirrors the style's auto_offset/no_offset setting (ref:
    src/LEPTON/bond_lepton.cpp settings(): auto_offset is the default;
    no_offset keeps the raw E(0))."""
    from ..utils.lepton import lepton_fn

    lead = np.zeros(ntypes + 1)
    fns: list = [None] * (ntypes + 1)
    for toks in rows:
        t = int(toks[0])
        if extra_lead:
            lead[t] = float(toks[1])
        fn = lepton_fn(toks[1 + extra_lead])
        off = float(fn(**{var: 0.0})) if offset else 0.0
        fns[t] = (fn, off)
    return lead, tuple(fns)


def make_bond_lepton(ntypes, rows, dtype=jnp.float64, offset=True):
    lead, fns = _lepton_fns(rows, ntypes, extra_lead=1, var="r",
                            offset=offset)
    return BondLepton(r0=jnp.asarray(lead, dtype=dtype), fns=fns)


def make_angle_lepton(ntypes, rows, dtype=jnp.float64, offset=True):
    lead, fns = _lepton_fns(rows, ntypes, extra_lead=1, var="theta",
                            offset=offset)
    return AngleLepton(theta0=jnp.asarray(lead * _D2R, dtype=dtype),
                       fns=fns)


def make_dihedral_lepton(ntypes, rows, dtype=jnp.float64, offset=True):
    _, fns = _lepton_fns(rows, ntypes, extra_lead=0, var="phi",
                         offset=offset)
    return DihedralLepton(fns=fns)
