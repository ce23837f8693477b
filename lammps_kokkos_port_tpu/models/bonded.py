"""Bonded force-field terms: bond / angle / dihedral / improper styles.

TPU-native equivalents of the reference's MOLECULE-package styles
(ref: src/MOLECULE/bond_harmonic.cpp, bond_fene.cpp, angle_harmonic.cpp,
angle_charmm.cpp, angle_cosine.cpp, dihedral_charmm.cpp,
dihedral_harmonic.cpp, dihedral_opls.cpp, improper_harmonic.cpp; Kokkos
twins in src/KOKKOS/*_kokkos.cpp).

Design: each interaction term is an ENERGY function of its minimum-image
displacement vectors; forces come from jax.grad per term (exact — the
energy expressions are LAMMPS's own closed forms), accumulated with
scatter-add (`.at[].add(mode="drop")`, which also drops padded terms whose
atom index is the `cap` sentinel). This replaces the reference's hand-coded
force algebra with the same math at identical precision while keeping the
whole bonded pass one fused XLA graph. The virial is tallied as
sum_a r_a (x) f_a with r_a measured from the term's second atom — identical
to the reference's ev_tally2/3/4 pair-sum convention.
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


def _voigt(outer_sum: Array) -> Array:
    """[3,3] tensor -> Voigt 6 (xx,yy,zz,xy,xz,yz)."""
    return jnp.stack([
        outer_sum[0, 0], outer_sum[1, 1], outer_sum[2, 2],
        outer_sum[0, 1], outer_sum[0, 2], outer_sum[1, 2],
    ])


@jax.custom_jvp
def _acos_safe(c: Array) -> Array:
    """arccos with a BOUNDED gradient at |c| -> 1.

    The reference floors s = sqrt(1-c^2) at SMALL = 0.001 so collinear
    angles exert a large-but-finite restoring force (ref:
    src/MOLECULE/angle_charmm.cpp / angle_harmonic.cpp `if (s < SMALL)`).
    A plain epsilon-clip fails in f32 — 1 - 1e-12 rounds to exactly 1.0,
    so near-collinear angles autodiffed to NaN and blew up trajectories
    (r5 rhodo-mix diagnosis); the custom JVP applies the reference's
    floor to the derivative itself."""
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


@_acos_safe.defjvp
def _acos_safe_jvp(primals, tangents):
    (c,) = primals
    (dc,) = tangents
    cc = jnp.clip(c, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum(1.0 - cc * cc, 0.0))
    s = jnp.maximum(s, 1e-3)  # SMALL, ref: angle_charmm.cpp
    return jnp.arccos(cc), -dc / s


def _params(table: Array, t: Array):
    return table[t]


# ---------------------------------------------------------------------------
# Bonds (2-body)
# ---------------------------------------------------------------------------


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "r0"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class BondHarmonic:
    """E = K (r - r0)^2 (ref: src/MOLECULE/bond_harmonic.cpp:48)."""

    k: Array  # [ntypes+1]
    r0: Array

    def energy_one(self, dx, t):
        r = jnp.sqrt(jnp.sum(dx * dx))
        dr = r - self.r0[t]
        return self.k[t] * dr * dr


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "r0", "epsilon", "sigma"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class BondFENE:
    """E = -0.5 K R0^2 ln(1-(r/R0)^2) + LJ(r<2^(1/6) sigma) + epsilon
    (ref: src/MOLECULE/bond_fene.cpp)."""

    k: Array
    r0: Array
    epsilon: Array
    sigma: Array

    def energy_one(self, dx, t):
        r2 = jnp.sum(dx * dx)
        r0sq = self.r0[t] * self.r0[t]
        rlogarg = jnp.clip(1.0 - r2 / r0sq, 0.02, None)  # overstretch guard
        e = -0.5 * self.k[t] * r0sq * jnp.log(rlogarg)
        # WCA repulsive part inside 2^(1/6) sigma
        sr2 = self.sigma[t] * self.sigma[t] / r2
        sr6 = sr2 * sr2 * sr2
        wca = 4.0 * self.epsilon[t] * (sr6 * sr6 - sr6) + self.epsilon[t]
        inside = r2 < 2.0 ** (1.0 / 3.0) * self.sigma[t] * self.sigma[t]
        return e + jnp.where(inside, wca, 0.0)


def compute_bonds(style, state: State, top: Topology, eflag, vflag):
    if top.bonds.shape[0] == 0:
        return None
    if hasattr(style, "compute"):  # explicit-force styles
        return style.compute(state, top, eflag, vflag)
    t = top.bonds[:, 0]
    i = top.bonds[:, 1]
    j = top.bonds[:, 2]
    cap = state.capacity
    valid = t > 0
    xi = state.x[jnp.clip(i, 0, cap - 1)]
    xj = state.x[jnp.clip(j, 0, cap - 1)]
    dx = state.box.min_image(xi - xj)

    e_one = lambda d, tt: style.energy_one(d, tt)
    e, g = jax.vmap(jax.value_and_grad(e_one))(dx, t)
    g = jnp.where(valid[:, None], g, 0.0)

    f = jnp.zeros_like(state.x)
    f = f.at[i].add(-g, mode="drop")
    f = f.at[j].add(g, mode="drop")

    energy = jnp.sum(jnp.where(valid, e, 0.0)) if eflag else None
    virial = None
    if vflag:
        w = -g  # force on atom i; virial = sum dx (x) f_i
        virial = _voigt(jnp.einsum("na,nb->ab", dx, w))
    return f, energy, virial


# ---------------------------------------------------------------------------
# Angles (3-body; d1 = x_i - x_j, d2 = x_k - x_j, j = center)
# ---------------------------------------------------------------------------


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "theta0"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class AngleHarmonic:
    """E = K (theta - theta0)^2 (ref: src/MOLECULE/angle_harmonic.cpp)."""

    k: Array
    theta0: Array  # radians

    def energy_one(self, d1, d2, t):
        c = jnp.dot(d1, d2) / jnp.sqrt(
            jnp.sum(d1 * d1) * jnp.sum(d2 * d2)
        )
        dtheta = _acos_safe(c) - self.theta0[t]
        return self.k[t] * dtheta * dtheta


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "theta0", "k_ub", "r_ub"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class AngleCharmm:
    """E = K (theta-theta0)^2 + K_ub (r_ik - r_ub)^2
    (ref: src/MOLECULE/angle_charmm.cpp:56 — harmonic + Urey-Bradley 1-3)."""

    k: Array
    theta0: Array
    k_ub: Array
    r_ub: Array

    def energy_one(self, d1, d2, t):
        c = jnp.dot(d1, d2) / jnp.sqrt(
            jnp.sum(d1 * d1) * jnp.sum(d2 * d2)
        )
        dtheta = _acos_safe(c) - self.theta0[t]
        e = self.k[t] * dtheta * dtheta
        d13 = d1 - d2  # x_i - x_k
        r13 = jnp.sqrt(jnp.sum(d13 * d13))
        dr = r13 - self.r_ub[t]
        return e + self.k_ub[t] * dr * dr


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "theta0"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class AngleCosine:
    """E = K (1 + cos theta) (ref: src/MOLECULE/angle_cosine.cpp);
    theta0 unused (kept for uniform table layout)."""

    k: Array
    theta0: Array

    def energy_one(self, d1, d2, t):
        c = jnp.dot(d1, d2) / jnp.sqrt(
            jnp.sum(d1 * d1) * jnp.sum(d2 * d2)
        )
        return self.k[t] * (1.0 + c)


def compute_angles(style, state: State, top: Topology, eflag, vflag):
    if top.angles.shape[0] == 0:
        return None
    if hasattr(style, "compute"):  # explicit-force styles
        return style.compute(state, top, eflag, vflag)
    t = top.angles[:, 0]
    i, j, k = top.angles[:, 1], top.angles[:, 2], top.angles[:, 3]
    cap = state.capacity
    valid = t > 0
    xi = state.x[jnp.clip(i, 0, cap - 1)]
    xj = state.x[jnp.clip(j, 0, cap - 1)]
    xk = state.x[jnp.clip(k, 0, cap - 1)]
    d1 = state.box.min_image(xi - xj)
    d2 = state.box.min_image(xk - xj)

    e_one = lambda a, b, tt: style.energy_one(a, b, tt)
    e, (g1, g2) = jax.vmap(jax.value_and_grad(e_one, argnums=(0, 1)))(d1, d2, t)
    g1 = jnp.where(valid[:, None], g1, 0.0)
    g2 = jnp.where(valid[:, None], g2, 0.0)

    f = jnp.zeros_like(state.x)
    f = f.at[i].add(-g1, mode="drop")
    f = f.at[k].add(-g2, mode="drop")
    f = f.at[j].add(g1 + g2, mode="drop")

    energy = jnp.sum(jnp.where(valid, e, 0.0)) if eflag else None
    virial = None
    if vflag:
        virial = _voigt(
            jnp.einsum("na,nb->ab", d1, -g1) + jnp.einsum("na,nb->ab", d2, -g2)
        )
    return f, energy, virial


# ---------------------------------------------------------------------------
# Dihedrals (4-body; vb1 = x1-x2, vb2 = x3-x2, vb3 = x4-x3)
# ---------------------------------------------------------------------------


def _dihedral_phi(vb1, vb2, vb3):
    """Dihedral angle with the reference's sign convention
    (ref: dihedral_charmm.cpp geometry: phi from (a=vb1 x vb2m, b=vb3 x vb2m))."""
    # use vb2m = -vb2 as in the reference
    b1, b2m, b3 = vb1, -vb2, vb3
    a = jnp.cross(b1, b2m)
    b = jnp.cross(b3, b2m)
    norm = jnp.sqrt(
        jnp.maximum(jnp.sum(a * a) * jnp.sum(b * b), 1e-30)
    )
    c = jnp.dot(a, b) / norm
    b2len = jnp.sqrt(jnp.maximum(jnp.sum(b2m * b2m), 1e-30))
    # s = rg * rabinv * (a . vb3), ref: dihedral_charmm.cpp:141
    # ((a x b) . vb2m flips the sign: asymmetric phases d expose it)
    s = jnp.dot(a, b3) * b2len / norm
    return jnp.arctan2(s, c)


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "n", "d", "weight",
                      "lj14_1", "lj14_2", "lj14_3", "lj14_4"],
         meta_fields=["qqr2e", "weightflag"])
@dataclasses.dataclass(frozen=True)
class DihedralCharmm:
    """E = K [1 + cos(n phi - d)] plus the weighted 1-4 LJ/Coulomb pair
    between atoms 1 and 4 using the pair style's lj14 tables
    (ref: src/MOLECULE/dihedral_charmm.cpp:63 and :245-281 — plain 1/r
    Coulomb, lj14_{1..4} extracted from the CHARMM pair style, energies
    tallied into the PAIR accumulators via force->pair->ev_tally)."""

    k: Array
    n: Array  # integer multiplicity as float table
    d: Array  # phase in radians
    weight: Array  # [ndihedraltypes+1] 1-4 weights
    lj14_3: Array  # [natomtypes+1]^2: 4 eps14 sigma14^12
    lj14_4: Array  # 4 eps14 sigma14^6
    lj14_1: Array  # 48 eps14 sigma14^12 (unused: grad derives the force)
    lj14_2: Array  # 24 eps14 sigma14^6
    qqr2e: float = 0.0
    weightflag: bool = False

    def energy_one(self, vb1, vb2, vb3, t):
        phi = _dihedral_phi(vb1, vb2, vb3)
        return self.k[t] * (1.0 + jnp.cos(self.n[t] * phi - self.d[t]))

    def energy_14(self, dx, t, it, jt, qi, qj):
        """weight * (plain-Coulomb + 12-6 LJ with the 14 coeffs)
        (ref: dihedral_charmm.cpp:245-266)."""
        r2 = jnp.sum(dx * dx)
        rinv = jax.lax.rsqrt(r2)
        r6inv = (rinv * rinv) ** 3
        ecoul = self.qqr2e * qi * qj * rinv
        evdwl = r6inv * (self.lj14_3[it, jt] * r6inv - self.lj14_4[it, jt])
        return self.weight[t] * (ecoul + evdwl)


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "n", "d"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class DihedralHarmonic:
    """E = K [1 + d cos(n phi)] (ref: src/MOLECULE/dihedral_harmonic.cpp)."""

    k: Array
    n: Array
    d: Array  # +1/-1

    def energy_one(self, vb1, vb2, vb3, t):
        phi = _dihedral_phi(vb1, vb2, vb3)
        return self.k[t] * (1.0 + self.d[t] * jnp.cos(self.n[t] * phi))


@partial(jax.tree_util.register_dataclass,
         data_fields=["k1", "k2", "k3", "k4"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class DihedralOPLS:
    """E = 0.5[K1(1+cos phi) + K2(1-cos 2phi) + K3(1+cos 3phi) + K4(1-cos 4phi)]
    (ref: src/OPLS dihedral_opls.cpp)."""

    k1: Array
    k2: Array
    k3: Array
    k4: Array

    def energy_one(self, vb1, vb2, vb3, t):
        phi = _dihedral_phi(vb1, vb2, vb3)
        return 0.5 * (
            self.k1[t] * (1.0 + jnp.cos(phi))
            + self.k2[t] * (1.0 - jnp.cos(2.0 * phi))
            + self.k3[t] * (1.0 + jnp.cos(3.0 * phi))
            + self.k4[t] * (1.0 - jnp.cos(4.0 * phi))
        )


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "chi0"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ImproperHarmonic:
    """E = K (chi - chi0)^2 (ref: src/MOLECULE/improper_harmonic.cpp:57;
    chi is the angle between the ijk and jkl planes)."""

    k: Array
    chi0: Array  # radians

    def energy_one(self, vb1, vb2, vb3, t):
        # the reference's exact cosine construction
        # (ref: improper_harmonic.cpp: c = (c1*c2 + c0) * sqrt(1/s1 * 1/s2))
        SMALL = 0.001
        r1 = jax.lax.rsqrt(jnp.sum(vb1 * vb1))
        r2 = jax.lax.rsqrt(jnp.sum(vb2 * vb2))
        r3 = jax.lax.rsqrt(jnp.sum(vb3 * vb3))
        c0 = jnp.dot(vb1, vb3) * r1 * r3
        c1 = jnp.dot(vb1, vb2) * r1 * r2
        c2 = -jnp.dot(vb3, vb2) * r3 * r2
        s1 = jnp.maximum(1.0 - c1 * c1, SMALL)
        s2 = jnp.maximum(1.0 - c2 * c2, SMALL)
        c = (c1 * c2 + c0) / jnp.sqrt(s1 * s2)
        chi = _acos_safe(c)
        d = chi - self.chi0[t]
        return self.k[t] * d * d


def compute_dihedrals(style, state: State, top: Topology, eflag, vflag,
                      which: str = "dihedrals"):
    arr = getattr(top, which)
    if arr.shape[0] == 0:
        return None
    if hasattr(style, "compute"):  # explicit-force styles
        return style.compute(state, top, eflag, vflag) + (None,)
    t = arr[:, 0]
    a1, a2, a3, a4 = arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4]
    cap = state.capacity
    valid = t > 0
    x1 = state.x[jnp.clip(a1, 0, cap - 1)]
    x2 = state.x[jnp.clip(a2, 0, cap - 1)]
    x3 = state.x[jnp.clip(a3, 0, cap - 1)]
    x4 = state.x[jnp.clip(a4, 0, cap - 1)]
    vb1 = state.box.min_image(x1 - x2)
    vb2 = state.box.min_image(x3 - x2)
    vb3 = state.box.min_image(x4 - x3)

    e_one = lambda b1, b2, b3, tt: style.energy_one(b1, b2, b3, tt)
    e, (g1, g2, g3) = jax.vmap(
        jax.value_and_grad(e_one, argnums=(0, 1, 2))
    )(vb1, vb2, vb3, t)
    g1 = jnp.where(valid[:, None], g1, 0.0)
    g2 = jnp.where(valid[:, None], g2, 0.0)
    g3 = jnp.where(valid[:, None], g3, 0.0)

    # E = E(vb1, vb2, vb3) with vb1=x1-x2, vb2=x3-x2, vb3=x4-x3:
    # dE/dx1 = g1; dE/dx2 = -g1-g2; dE/dx3 = g2-g3; dE/dx4 = g3
    f1 = -g1
    f2 = g1 + g2
    f3 = -g2 + g3
    f4 = -g3

    f = jnp.zeros_like(state.x)
    f = f.at[a1].add(f1, mode="drop")
    f = f.at[a2].add(f2, mode="drop")
    f = f.at[a3].add(f3, mode="drop")
    f = f.at[a4].add(f4, mode="drop")

    energy = jnp.sum(jnp.where(valid, e, 0.0)) if eflag else None
    virial = None
    if vflag:
        # sum r_a (x) f_a with r measured from x2:
        # r1 = vb1, r2 = 0, r3 = vb2, r4 = vb2 + vb3
        virial = _voigt(
            jnp.einsum("na,nb->ab", vb1, f1)
            + jnp.einsum("na,nb->ab", vb2, f3)
            + jnp.einsum("na,nb->ab", vb2 + vb3, f4)
        )

    # CHARMM 1-4 pair term between atoms 1 and 4 — energy AND virial are
    # tallied into the PAIR accumulators in the reference
    # (ref: dihedral_charmm.cpp:281 force->pair->ev_tally), so they are
    # returned separately from the torsion's.
    extra14 = None
    if getattr(style, "weightflag", False):
        dx14 = state.box.min_image(x1 - x4)
        it = state.type[jnp.clip(a1, 0, cap - 1)]
        jt = state.type[jnp.clip(a4, 0, cap - 1)]
        qi = state.q[jnp.clip(a1, 0, cap - 1)]
        qj = state.q[jnp.clip(a4, 0, cap - 1)]
        ev, gv = jax.vmap(jax.value_and_grad(style.energy_14))(
            dx14, t, it, jt, qi, qj
        )
        gv = jnp.where(valid[:, None], gv, 0.0)
        f = f.at[a1].add(-gv, mode="drop")
        f = f.at[a4].add(gv, mode="drop")
        e14 = jnp.sum(jnp.where(valid, ev, 0.0)) if eflag else None
        v14 = (_voigt(jnp.einsum("na,nb->ab", dx14, -gv))
               if vflag else None)
        extra14 = (e14, v14)
    return f, energy, virial, extra14


# ---------------------------------------------------------------------------
# Coeff table builders (host)
# ---------------------------------------------------------------------------


def table(ntypes: int, coeffs: dict[int, tuple], ncols: int, dtype) -> list:
    """coeffs[type 1-based] = column tuple -> list of [ntypes+1] arrays."""
    out = np.zeros((ncols, ntypes + 1))
    for t, c in coeffs.items():
        for ci in range(ncols):
            out[ci, t] = c[ci]
    return [jnp.asarray(out[ci], dtype=dtype) for ci in range(ncols)]


def make_bond_harmonic(ntypes, coeffs, dtype=jnp.float64) -> BondHarmonic:
    k, r0 = table(ntypes, coeffs, 2, dtype)
    return BondHarmonic(k=k, r0=r0)


def make_bond_fene(ntypes, coeffs, dtype=jnp.float64) -> BondFENE:
    k, r0, eps, sig = table(ntypes, coeffs, 4, dtype)
    return BondFENE(k=k, r0=r0, epsilon=eps, sigma=sig)


def make_angle_harmonic(ntypes, coeffs, dtype=jnp.float64) -> AngleHarmonic:
    """coeffs: (K, theta0_degrees) as in the input script."""
    k, th = table(ntypes, coeffs, 2, dtype)
    return AngleHarmonic(k=k, theta0=th * (np.pi / 180.0))


def make_angle_cosine(ntypes, coeffs, dtype=jnp.float64) -> AngleCosine:
    (k,) = table(ntypes, coeffs, 1, dtype)
    return AngleCosine(k=k, theta0=jnp.zeros_like(k))


def make_angle_charmm(ntypes, coeffs, dtype=jnp.float64) -> AngleCharmm:
    k, th, kub, rub = table(ntypes, coeffs, 4, dtype)
    return AngleCharmm(k=k, theta0=th * (np.pi / 180.0), k_ub=kub, r_ub=rub)


def make_dihedral_charmm(ntypes, coeffs, dtype=jnp.float64,
                         pair=None, qqr2e: float = 0.0) -> DihedralCharmm:
    """coeffs: (K, n, d_degrees[, weight]) per type. A nonzero weight
    requires a CHARMM pair style providing lj14 tables (ref:
    dihedral_charmm.cpp:360-379 extract("lj14_*"))."""
    k, n, d = table(ntypes, {t: c[:3] for t, c in coeffs.items()}, 3, dtype)
    w = np.zeros(ntypes + 1)
    for t, c in coeffs.items():
        w[t] = c[3] if len(c) > 3 else 0.0
    weightflag = bool((w != 0.0).any())
    if weightflag:
        if pair is None or not hasattr(pair, "lj14_1"):
            raise ValueError(
                "dihedral_style charmm with nonzero 1-4 weight requires a "
                "CHARMM pair style with lj14 coeffs (ref: "
                "dihedral_charmm.cpp:361 'must be set to charmm pair style')"
            )
        l1, l2, l3, l4 = (pair.lj14_1, pair.lj14_2, pair.lj14_3, pair.lj14_4)
        l1, l2, l3, l4 = (jnp.asarray(a, dtype=dtype) for a in (l1, l2, l3, l4))
    else:
        z = jnp.zeros((1, 1), dtype=dtype)
        l1 = l2 = l3 = l4 = z
    return DihedralCharmm(
        k=k, n=n, d=d * (np.pi / 180.0),
        weight=jnp.asarray(w, dtype=dtype),
        lj14_1=l1, lj14_2=l2, lj14_3=l3, lj14_4=l4,
        qqr2e=float(qqr2e), weightflag=weightflag,
    )


def make_dihedral_opls(ntypes, coeffs, dtype=jnp.float64) -> DihedralOPLS:
    k1, k2, k3, k4 = table(ntypes, coeffs, 4, dtype)
    return DihedralOPLS(k1=k1, k2=k2, k3=k3, k4=k4)


def make_improper_harmonic(ntypes, coeffs, dtype=jnp.float64) -> ImproperHarmonic:
    k, chi = table(ntypes, coeffs, 2, dtype)
    return ImproperHarmonic(k=k, chi0=chi * (np.pi / 180.0))
