"""fix rigid / rigid/nve (+ /small variants): rigid-body dynamics.

TPU-native re-implementation of the reference's RIGID package core
(ref: src/RIGID/fix_rigid.cpp — initial/final_integrate :915,997,
compute_forces_and_torques :1145, set_xv/set_v :1358,1537; quaternion
math src/math_extra.cpp:100 richardson, angmom_to_omega, mq_to_omega;
the /small variants share the physics, differing only in MPI body
storage — moot on a single memory space).

Design: bodies are fixed-width arrays [NB,...]; per-atom body index map
[cap] (-1 = not in a body). All body reductions are segment-sums
(scatter-add), all body updates one vmapped quaternion step — the whole
integrator stays inside the jitted step. Body discovery + principal-axis
setup (Jacobi eigensolve) run host-side once at setup, like
setup_bodies_static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from .verlet import Integrator

Array = jax.Array

AUX = "rigid"


# -- quaternion helpers (ref: src/math_extra.h/cpp) -------------------------


def _qnormalize(q):
    return q / jnp.sqrt(jnp.sum(q * q))


def _vecquat(a, b):
    """c = (0,a) * b (ref: MathExtra::vecquat)."""
    return jnp.stack([
        -a[0] * b[1] - a[1] * b[2] - a[2] * b[3],
        b[0] * a[0] + a[1] * b[3] - a[2] * b[2],
        b[0] * a[1] + a[2] * b[1] - a[0] * b[3],
        b[0] * a[2] + a[0] * b[2] - a[1] * b[1],
    ])


def _q_to_exyz(q):
    ex = jnp.stack([q[0] * q[0] + q[1] * q[1] - q[2] * q[2] - q[3] * q[3],
                    2.0 * (q[1] * q[2] + q[0] * q[3]),
                    2.0 * (q[1] * q[3] - q[0] * q[2])])
    ey = jnp.stack([2.0 * (q[1] * q[2] - q[0] * q[3]),
                    q[0] * q[0] - q[1] * q[1] + q[2] * q[2] - q[3] * q[3],
                    2.0 * (q[2] * q[3] + q[0] * q[1])])
    ez = jnp.stack([2.0 * (q[1] * q[3] + q[0] * q[2]),
                    2.0 * (q[2] * q[3] - q[0] * q[1]),
                    q[0] * q[0] - q[1] * q[1] - q[2] * q[2] + q[3] * q[3]])
    return ex, ey, ez


def _angmom_to_omega(m, ex, ey, ez, idiag):
    wb = jnp.stack([
        jnp.where(idiag[0] == 0.0, 0.0, jnp.dot(m, ex) / idiag[0]),
        jnp.where(idiag[1] == 0.0, 0.0, jnp.dot(m, ey) / idiag[1]),
        jnp.where(idiag[2] == 0.0, 0.0, jnp.dot(m, ez) / idiag[2]),
    ])
    return wb[0] * ex + wb[1] * ey + wb[2] * ez


def _mq_to_omega(m, q, moments):
    ex, ey, ez = _q_to_exyz(q)
    # rot columns are ex,ey,ez; transpose_matvec(rot, m) = [m.ex, m.ey, m.ez]
    wb = jnp.stack([jnp.dot(m, ex), jnp.dot(m, ey), jnp.dot(m, ez)])
    wb = jnp.where(moments == 0.0, 0.0, wb / jnp.where(moments == 0.0,
                                                       1.0, moments))
    return wb[0] * ex + wb[1] * ey + wb[2] * ez


def _richardson(q, m, w, moments, dtq):
    """(ref: MathExtra::richardson) -> (q_new, w_half)."""
    wq = _vecquat(w, q)
    qfull = _qnormalize(q + dtq * wq)
    qhalf = _qnormalize(q + 0.5 * dtq * wq)
    w2 = _mq_to_omega(m, qhalf, moments)
    wq2 = _vecquat(w2, qhalf)
    qhalf2 = _qnormalize(qhalf + 0.5 * dtq * wq2)
    qnew = _qnormalize(2.0 * qhalf2 - qfull)
    return qnew, w2


@dataclasses.dataclass(frozen=True)
class IntegratorRigid(Integrator):
    """Integrator for `fix <g> rigid|rigid/nve single|molecule|group ...`.

    Atoms outside any body are NOT integrated (the reference decks add a
    separate fix nve for them; the interpreter composes that as this
    integrator's groupbit complement via make-step fix ordering)."""

    nbody: int = 0

    # -- setup (ref: setup_bodies_static/dynamic) ---------------------------

    def setup(self, state: State) -> State:
        if "rigid_body" not in state.aux:
            raise ValueError("IntegratorRigid needs rigid_body in aux "
                             "(installed by build_rigid)")
        return self._derive_bodies(state)

    def _derive_bodies(self, state: State) -> State:
        """setup_bodies_static + setup_bodies_dynamic from CURRENT atom
        positions/velocities (host-side numpy). The reference re-runs
        this at EVERY run command (reinitflag defaults on,
        fix_rigid.cpp:770), re-baselining body geometry that barostats
        have slightly deformed."""
        body = state.aux["rigid_body"]  # [cap] int32, -1 = free atom
        nb = self.nbody
        x = np.asarray(jax.device_get(state.x), dtype=np.float64)
        v = np.asarray(jax.device_get(state.v), dtype=np.float64)
        img = np.asarray(jax.device_get(state.image))
        h = np.asarray(jax.device_get(state.box.h), dtype=np.float64)
        m = np.asarray(jax.device_get(state.per_atom_mass),
                       dtype=np.float64)
        b = np.asarray(jax.device_get(body))
        # unwrapped coords via the upper-triangular cell matrix (exact
        # for triclinic too; ref: Domain::unmap)
        xu = x + img @ h.T

        masstotal = np.zeros(nb)
        xcm = np.zeros((nb, 3))
        for i in np.flatnonzero(b >= 0):
            masstotal[b[i]] += m[i]
            xcm[b[i]] += m[i] * xu[i]
        xcm /= masstotal[:, None]

        # inertia tensor + principal axes (ref: :1961-1990)
        inertia = np.zeros((nb, 3))
        ex = np.zeros((nb, 3))
        ey = np.zeros((nb, 3))
        ez = np.zeros((nb, 3))
        for ib in range(nb):
            idx = np.flatnonzero(b == ib)
            d = xu[idx] - xcm[ib]
            mm = m[idx]
            t = np.zeros((3, 3))
            t[0, 0] = np.sum(mm * (d[:, 1] ** 2 + d[:, 2] ** 2))
            t[1, 1] = np.sum(mm * (d[:, 0] ** 2 + d[:, 2] ** 2))
            t[2, 2] = np.sum(mm * (d[:, 0] ** 2 + d[:, 1] ** 2))
            t[0, 1] = t[1, 0] = -np.sum(mm * d[:, 0] * d[:, 1])
            t[0, 2] = t[2, 0] = -np.sum(mm * d[:, 0] * d[:, 2])
            t[1, 2] = t[2, 1] = -np.sum(mm * d[:, 1] * d[:, 2])
            evals, evecs = np.linalg.eigh(t)
            # eigh is ascending; jacobi3 sorts DEscending? the pairing of
            # (moment, axis) is what matters — any consistent order gives
            # identical dynamics
            inertia[ib] = evals
            ex[ib], ey[ib], ez[ib] = evecs[:, 0], evecs[:, 1], evecs[:, 2]
            mx = inertia[ib].max()
            inertia[ib][inertia[ib] < 1e-7 * mx] = 0.0
            # right-handed frame (ref: cross/dot flip)
            if np.dot(np.cross(ex[ib], ey[ib]), ez[ib]) < 0.0:
                ez[ib] = -ez[ib]

        # displace = body-frame coords (ref: :2010-2025)
        disp = np.zeros_like(x)
        for i in np.flatnonzero(b >= 0):
            d = xu[i] - xcm[b[i]]
            disp[i] = [np.dot(d, ex[b[i]]), np.dot(d, ey[b[i]]),
                       np.dot(d, ez[b[i]])]

        # quaternion from frame (ref: exyz_to_q)
        quat = np.zeros((nb, 4))
        for ib in range(nb):
            quat[ib] = _exyz_to_q_np(ex[ib], ey[ib], ez[ib])

        # dynamic: vcm + angmom from current velocities
        # (ref: setup_bodies_dynamic)
        vcm = np.zeros((nb, 3))
        angmom = np.zeros((nb, 3))
        for i in np.flatnonzero(b >= 0):
            vcm[b[i]] += m[i] * v[i]
        vcm /= masstotal[:, None]
        for i in np.flatnonzero(b >= 0):
            d = xu[i] - xcm[b[i]]
            angmom[b[i]] += m[i] * np.cross(d, v[i])

        dt = state.dtype
        aux = {**state.aux, AUX: {
            **state.aux.get(AUX, {}),  # keep chain state across re-derives
            "xcm": jnp.asarray(xcm, dt), "vcm": jnp.asarray(vcm, dt),
            "angmom": jnp.asarray(angmom, dt),
            "quat": jnp.asarray(quat, dt),
            "inertia": jnp.asarray(inertia, dt),
            "masstotal": jnp.asarray(masstotal, dt),
            "displace": jnp.asarray(disp, dt),
        }}
        # NOTE: the reference also projects atom velocities onto the body
        # motion here (FixRigid::setup tail); for the NH variants that
        # projection carries a virial tally needing current forces, so it
        # lives in refresh_segment (runs after the force pass)
        return state.replace(aux=aux)

    # -- body force/torque reduction (ref: compute_forces_and_torques) ------

    def _fcm_torque(self, state: State):
        body = state.aux["rigid_body"]
        rb = state.aux[AUX]
        nb = self.nbody
        inb = body >= 0
        bidx = jnp.where(inb, body, 0)
        xu = state.box.unwrap(state.x, state.image)
        f = jnp.where(inb[:, None], state.f, 0.0)
        fcm = jnp.zeros((nb, 3), state.dtype).at[bidx].add(
            f, mode="drop")
        d = xu - rb["xcm"][bidx]
        tq = jnp.cross(d, f)
        tq = jnp.where(inb[:, None], tq, 0.0)
        torque = jnp.zeros((nb, 3), state.dtype).at[bidx].add(
            tq, mode="drop")
        return fcm, torque

    @property
    def dtq(self) -> float:
        return 0.5 * self.dt

    # -- hooks --------------------------------------------------------------

    def initial_integrate(self, state: State) -> State:
        rb = dict(state.aux[AUX])
        fcm, torque = self._fcm_torque(state)
        dtfm = self.dtf / rb["masstotal"][:, None]
        vcm = rb["vcm"] + dtfm * fcm
        xcm = rb["xcm"] + self.dt * vcm
        angmom = rb["angmom"] + self.dtf * torque

        def one(q, m, idiag):
            ex, ey, ez = _q_to_exyz(q)
            w = _angmom_to_omega(m, ex, ey, ez, idiag)
            qn, wh = _richardson(q, m, w, idiag, self.dtq)
            return qn, wh

        quat, omega = jax.vmap(one)(rb["quat"], angmom, rb["inertia"])
        rb.update(vcm=vcm, xcm=xcm, angmom=angmom, quat=quat)
        state = state.replace(aux={**state.aux, AUX: rb})
        return self._set_xv(state, omega)

    def final_integrate(self, state: State) -> State:
        rb = dict(state.aux[AUX])
        fcm, torque = self._fcm_torque(state)
        dtfm = self.dtf / rb["masstotal"][:, None]
        vcm = rb["vcm"] + dtfm * fcm
        angmom = rb["angmom"] + self.dtf * torque

        def omega_of(q, m, idiag):
            ex, ey, ez = _q_to_exyz(q)
            return _angmom_to_omega(m, ex, ey, ez, idiag)

        omega = jax.vmap(omega_of)(rb["quat"], angmom, rb["inertia"])
        rb.update(vcm=vcm, angmom=angmom)
        state = state.replace(aux={**state.aux, AUX: rb})
        return self._set_v(state, omega)

    # -- atom reconstruction (ref: set_xv/set_v) ----------------------------

    def _frames(self, rb):
        ex, ey, ez = jax.vmap(_q_to_exyz)(rb["quat"])
        return ex, ey, ez

    tally_virial: bool = False  # barostatted variants sense it

    def _cvir(self, state, inb, vnew, xu_old):
        """Constraint-virial half from a velocity reset (ref: set_xv/set_v
        evflag blocks: fc = m(v_new - v_old)/dtf - f; vr = 0.5 xu_old (x)
        fc, each call contributing one half of the step's total)."""
        m = state.per_atom_mass[:, None]
        fc = m * (vnew - state.v) / self.dtf - state.f
        fc = jnp.where(inb[:, None], fc, 0.0)
        return 0.5 * jnp.stack([
            jnp.sum(xu_old[:, 0] * fc[:, 0]),
            jnp.sum(xu_old[:, 1] * fc[:, 1]),
            jnp.sum(xu_old[:, 2] * fc[:, 2]),
            jnp.sum(xu_old[:, 0] * fc[:, 1]),
            jnp.sum(xu_old[:, 0] * fc[:, 2]),
            jnp.sum(xu_old[:, 1] * fc[:, 2]),
        ])

    def _set_xv(self, state: State, omega) -> State:
        body = state.aux["rigid_body"]
        rb = state.aux[AUX]
        inb = body >= 0
        bidx = jnp.where(inb, body, 0)
        ex, ey, ez = self._frames(rb)
        disp = rb["displace"]
        # world-frame displacement r = R d
        r = (ex[bidx] * disp[:, 0:1] + ey[bidx] * disp[:, 1:2]
             + ez[bidx] * disp[:, 2:3])
        om = omega[bidx]
        vnew = jnp.cross(om, r) + rb["vcm"][bidx]
        shift = state.box.unwrap(jnp.zeros_like(state.x), state.image)
        xu = r + rb["xcm"][bidx]
        xnew = xu - shift
        if self.tally_virial:
            xu_old = state.x + shift
            rb = dict(rb)
            rb["cvirial"] = (rb.get("cvirial", jnp.zeros(6, state.dtype))
                             + self._cvir(state, inb, vnew, xu_old))
            state = state.replace(aux={**state.aux, AUX: rb})
        x = jnp.where(inb[:, None], xnew, state.x)
        v = jnp.where(inb[:, None], vnew, state.v)
        return state.replace(x=x, v=v)

    def _set_v(self, state: State, omega, vfactor=1.0) -> State:
        body = state.aux["rigid_body"]
        rb = state.aux[AUX]
        inb = body >= 0
        bidx = jnp.where(inb, body, 0)
        ex, ey, ez = self._frames(rb)
        disp = rb["displace"]
        r = (ex[bidx] * disp[:, 0:1] + ey[bidx] * disp[:, 1:2]
             + ez[bidx] * disp[:, 2:3])
        vnew = jnp.cross(omega[bidx], r) + rb["vcm"][bidx]
        if self.tally_virial:
            xu = state.box.unwrap(state.x, state.image)
            rb = dict(rb)
            rb["cvirial"] = (rb.get("cvirial", jnp.zeros(6, state.dtype))
                             + vfactor * self._cvir(state, inb, vnew, xu))
            state = state.replace(aux={**state.aux, AUX: rb})
        v = jnp.where(inb[:, None], vnew, state.v)
        return state.replace(v=v)


def _exyz_to_q_np(ex, ey, ez):
    """(ref: MathExtra::exyz_to_q)"""
    q = np.zeros(4)
    q0sq = 0.25 * (ex[0] + ey[1] + ez[2] + 1.0)
    q1sq = q0sq - 0.5 * (ey[1] + ez[2])
    q2sq = q0sq - 0.5 * (ex[0] + ez[2])
    q3sq = q0sq - 0.5 * (ex[0] + ey[1])
    if q0sq >= 0.25:
        q[0] = np.sqrt(q0sq)
        q[1] = (ey[2] - ez[1]) / (4.0 * q[0])
        q[2] = (ez[0] - ex[2]) / (4.0 * q[0])
        q[3] = (ex[1] - ey[0]) / (4.0 * q[0])
    elif q1sq >= 0.25:
        q[1] = np.sqrt(q1sq)
        q[0] = (ey[2] - ez[1]) / (4.0 * q[1])
        q[2] = (ey[0] + ex[1]) / (4.0 * q[1])
        q[3] = (ex[2] + ez[0]) / (4.0 * q[1])
    elif q2sq >= 0.25:
        q[2] = np.sqrt(q2sq)
        q[0] = (ez[0] - ex[2]) / (4.0 * q[2])
        q[1] = (ey[0] + ex[1]) / (4.0 * q[2])
        q[3] = (ez[1] + ey[2]) / (4.0 * q[2])
    else:
        q[3] = np.sqrt(q3sq)
        q[0] = (ex[1] - ey[0]) / (4.0 * q[3])
        q[1] = (ez[0] + ex[2]) / (4.0 * q[3])
        q[2] = (ez[1] + ey[2]) / (4.0 * q[3])
    return q / np.linalg.norm(q)


def build_rigid_bodies(
    cap: int,
    groupmask: np.ndarray,        # [cap] bool: atoms in the fix group
    style: str,                   # single | molecule | group
    molecule: np.ndarray | None = None,   # [cap] molecule ids
    group_masks: list | None = None,      # for style group: list of bool[cap]
) -> tuple[np.ndarray, int]:
    """Host-side body assignment (ref: FixRigid ctor body styles).
    Returns (body[cap] int32 with -1 for free atoms, nbody)."""
    body = np.full(cap, -1, dtype=np.int32)
    if style == "single":
        body[groupmask] = 0
        return body, 1
    if style == "molecule":
        mols = np.unique(molecule[groupmask])
        for ib, mol in enumerate(sorted(mols)):
            body[groupmask & (molecule == mol)] = ib
        return body, len(mols)
    if style == "group":
        for ib, gm in enumerate(group_masks):
            body[groupmask & gm] = ib
        return body, len(group_masks)
    raise ValueError(style)


# -- fix rigid/nvt, rigid/npt, rigid/nph (ref: src/RIGID/fix_rigid_nh.cpp,
#    Kamberaj et al. J.Chem.Phys 122, 224114 (2005): no_squish symplectic
#    quaternion integration + separate translational/rotational NH chains
#    with Suzuki-Yoshida sub-iteration; /small twins share the physics) --


def _quatvec(a, b):
    """c = a * (0,b) (ref: MathExtra::quatvec: a quat, b 3-vector)."""
    return jnp.stack([
        -a[1] * b[0] - a[2] * b[1] - a[3] * b[2],
        a[0] * b[0] + a[2] * b[2] - a[3] * b[1],
        a[0] * b[1] + a[3] * b[0] - a[1] * b[2],
        a[0] * b[2] + a[1] * b[1] - a[2] * b[0],
    ])


def _invquatvec(a, b):
    """c = vector part of conj(a)*b (ref: MathExtra::invquatvec)."""
    return jnp.stack([
        -a[1] * b[0] + a[0] * b[1] + a[3] * b[2] - a[2] * b[3],
        -a[2] * b[0] - a[3] * b[1] + a[0] * b[2] + a[1] * b[3],
        -a[3] * b[0] + a[2] * b[1] - a[1] * b[2] + a[0] * b[3],
    ])


def _no_squish_rotate(k, p, q, inertia, dt):
    """(ref: MathExtra::no_squish_rotate) free-rotor evolution operator."""
    if k == 1:
        perm = jnp.array([1, 0, 3, 2])
        sign = jnp.asarray([-1.0, 1.0, 1.0, -1.0], p.dtype)
    elif k == 2:
        perm = jnp.array([2, 3, 0, 1])
        sign = jnp.asarray([-1.0, -1.0, 1.0, 1.0], p.dtype)
    else:
        perm = jnp.array([3, 2, 1, 0])
        sign = jnp.asarray([-1.0, 1.0, -1.0, 1.0], p.dtype)
    kq = sign * q[perm]
    kp = sign * p[perm]
    phi = jnp.dot(p, kq)
    phi = jnp.where(inertia[k - 1] == 0.0, 0.0,
                    phi / (4.0 * jnp.where(inertia[k - 1] == 0.0, 1.0,
                                           inertia[k - 1])))
    c, s = jnp.cos(dt * phi), jnp.sin(dt * phi)
    return c * p + s * kp, c * q + s * kq


def _maclaurin(x):
    x2 = x * x
    x4 = x2 * x2
    return (1.0 + (1.0 / 6.0) * x2 + (1.0 / 120.0) * x4
            + (1.0 / 5040.0) * x2 * x4 + (1.0 / 362880.0) * x4 * x4)


_SY3 = None  # computed lazily to keep module import cheap


def _sy_weights(order):
    import math

    if order == 3:
        w0 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
        return (w0, 1.0 - 2.0 * w0, w0)
    w0 = 1.0 / (4.0 - 4.0 ** (1.0 / 3.0))
    return (w0, w0, 1.0 - 4.0 * w0, w0, w0)


@dataclasses.dataclass(frozen=True)
class IntegratorRigidNH(IntegratorRigid):
    """fix rigid/nvt|npt|nph[/small]: no_squish rigid-body dynamics with
    Nose-Hoover thermostat chains (translational + rotational) and an
    isotropic/anisotropic barostat (epsilon_dot) per fix_rigid_nh.cpp."""

    tally_virial: bool = True
    tstat: bool = False
    t_start: float = 0.0
    t_stop: float = 0.0
    t_period: float = 1.0
    t_chain: int = 10
    t_iter: int = 1
    t_order: int = 3
    pstat: bool = False
    p_start: tuple = (0.0, 0.0, 0.0)
    p_stop: tuple = (0.0, 0.0, 0.0)
    p_period: tuple = (1.0, 1.0, 1.0)
    p_flag: tuple = (False, False, False)
    pcouple: str = "iso"
    p_chain: int = 10
    nf_t: float = 0.0     # translational DOF (set at build)
    nf_r: float = 0.0     # rotational DOF
    press_tdof: float = 0.0  # the 'all' temp compute's DOF for t0/ISO P

    @property
    def t_freq(self) -> float:
        return 1.0 / self.t_period

    @property
    def g_f(self) -> float:
        return self.nf_t + self.nf_r

    @property
    def pdim(self) -> int:
        return sum(1 for f in self.p_flag if f)

    @property
    def p_freq(self):
        return tuple(1.0 / p for p in self.p_period)

    @property
    def p_freq_max(self) -> float:
        return max(f for f, on in zip(self.p_freq, self.p_flag) if on) \
            if any(self.p_flag) else 1.0

    def setup(self, state: State) -> State:
        state = super().setup(state)
        rb = dict(state.aux[AUX])
        dt = state.dtype
        for nm, n in (("eta_t", self.t_chain), ("eta_r", self.t_chain),
                      ("eta_dot_t", self.t_chain),
                      ("eta_dot_r", self.t_chain),
                      ("eta_b", self.p_chain), ("eta_dot_b", self.p_chain)):
            rb[nm] = jnp.zeros(n, dtype=dt)
        rb["epsilon_dot"] = jnp.zeros(3, dtype=dt)
        rb["conjqm"] = jnp.zeros((self.nbody, 4), dtype=dt)
        rb["t_tgt"] = jnp.asarray(self.t_start, dt)
        aux = dict(state.aux)
        aux[AUX] = rb
        # the run window drives target ramps + triggers refresh_segment
        aux.setdefault("nh_run", jnp.zeros(2, jnp.int32))
        return state.replace(aux=aux)

    def refresh_segment(self, state: State) -> State:
        """Per-run re-setup (ref: FixRigid::setup tail + FixRigidNH::setup
        — both run at EVERY run command, after forces): project atom
        velocities onto body motion (with the 2x constraint-virial
        guesstimate), re-derive conjqm, re-measure t0 / ramp target, and
        re-initialize epsilon_dot from the current pressure."""
        state = self._derive_bodies(state)
        rb = dict(state.aux[AUX])
        dt = state.dtype
        rb["cvirial"] = jnp.zeros(6, dt)
        state = state.replace(aux={**state.aux, AUX: rb})

        def om(q, mm, idiag):
            exq, eyq, ezq = _q_to_exyz(q)
            return _angmom_to_omega(mm, exq, eyq, ezq, idiag)

        rb0 = state.aux[AUX]
        omega_j = jax.vmap(om)(rb0["quat"], rb0["angmom"], rb0["inertia"])
        state = self._set_v(state, omega_j, vfactor=2.0)

        rb = dict(state.aux[AUX])

        def conj(q, am):
            ex, ey, ez = _q_to_exyz(q)
            mbody = jnp.stack([jnp.dot(am, ex), jnp.dot(am, ey),
                               jnp.dot(am, ez)])
            return 2.0 * _quatvec(q, mbody)

        rb["conjqm"] = jax.vmap(conj)(rb["quat"], rb["angmom"])
        if self.tstat:
            rb["t_tgt"] = self._t_ramp(state)
        else:
            g = state.valid_mask
            m = jnp.where(g, state.per_atom_mass, 0.0)
            mvv = jnp.sum(m * jnp.sum(state.v * state.v, axis=-1))
            rb["t_tgt"] = self.units.mvv2e * mvv / (
                max(self.press_tdof, 1.0) * self.units.boltz)
        state = state.replace(aux={**state.aux, AUX: rb})
        if self.pstat:
            state = self._nh_epsilon_dot(state, *self._akin(state))
        return state

    def _t_ramp(self, state: State):
        run = state.aux.get("nh_run")
        if run is None:
            run = jnp.zeros(2, jnp.int32)
        begin = run[0].astype(state.dtype)
        span = jnp.maximum(run[1].astype(state.dtype) - begin, 1.0)
        delta = jnp.clip(
            (state.ntimestep.astype(state.dtype) - begin) / span, 0.0, 1.0)
        return self.t_start + delta * (self.t_stop - self.t_start)

    def _akin(self, state: State):
        """(akin_t, akin_r) from current body vcm/angmom/omega."""
        rb = state.aux[AUX]

        def om(q, m, idiag):
            ex, ey, ez = _q_to_exyz(q)
            return _angmom_to_omega(m, ex, ey, ez, idiag)

        omega = jax.vmap(om)(rb["quat"], rb["angmom"], rb["inertia"])
        akin_t = jnp.sum(rb["masstotal"]
                         * jnp.sum(rb["vcm"] * rb["vcm"], axis=-1))
        akin_r = jnp.sum(rb["angmom"] * omega)
        return akin_t, akin_r

    # -- chains (ref: nhc_temp_integrate / nhc_press_integrate) -------------

    def _nhc_temp(self, state: State, akin_t, akin_r) -> State:
        rb = dict(state.aux[AUX])
        boltz, mvv2e = self.units.boltz, self.units.mvv2e
        kt = boltz * rb["t_tgt"]
        M = self.t_chain
        t_mass = kt / (self.t_freq * self.t_freq)
        q_t = jnp.concatenate([jnp.asarray([self.nf_t], state.dtype)
                               * t_mass,
                               jnp.full((M - 1,), 1.0, state.dtype)
                               * t_mass])
        q_r = jnp.concatenate([jnp.asarray([self.nf_r], state.dtype)
                               * t_mass,
                               jnp.full((M - 1,), 1.0, state.dtype)
                               * t_mass])
        et, er = rb["eta_t"], rb["eta_r"]
        edt, edr = rb["eta_dot_t"], rb["eta_dot_r"]
        f_t = jnp.zeros(M, state.dtype)
        f_r = jnp.zeros(M, state.dtype)
        f_t = f_t.at[0].set((akin_t * mvv2e - self.nf_t * kt) / q_t[0])
        f_r = f_r.at[0].set((akin_r * mvv2e - self.nf_r * kt) / q_r[0])
        for k in range(1, M):
            f_t = f_t.at[k].set((q_t[k - 1] * edt[k - 1] ** 2 - kt)
                                / q_t[k])
            f_r = f_r.at[k].set((q_r[k - 1] * edr[k - 1] ** 2 - kt)
                                / q_r[k])

        dtv = self.dt
        for _ in range(self.t_iter):
            for wj in _sy_weights(self.t_order):
                w1 = wj * dtv / self.t_iter
                w2, w4 = w1 / 2.0, w1 / 4.0
                edt = edt.at[M - 1].add(w2 * f_t[M - 1])
                edr = edr.at[M - 1].add(w2 * f_r[M - 1])
                for k in range(1, M):
                    tmp = w4 * edt[M - k]
                    s = jnp.exp(-tmp)
                    edt = edt.at[M - k - 1].set(
                        edt[M - k - 1] * s * s
                        + w2 * f_t[M - k - 1] * s * _maclaurin(tmp))
                    tmp = w4 * edr[M - k]
                    s = jnp.exp(-tmp)
                    edr = edr.at[M - k - 1].set(
                        edr[M - k - 1] * s * s
                        + w2 * f_r[M - k - 1] * s * _maclaurin(tmp))
                et = et + w1 * edt
                er = er + w1 * edr
                for k in range(1, M):
                    f_t = f_t.at[k].set(
                        (q_t[k - 1] * edt[k - 1] ** 2 - kt) / q_t[k])
                    f_r = f_r.at[k].set(
                        (q_r[k - 1] * edr[k - 1] ** 2 - kt) / q_r[k])
                for k in range(0, M - 1):
                    tmp = w4 * edt[k + 1]
                    s = jnp.exp(-tmp)
                    edt = edt.at[k].set(edt[k] * s * s
                                        + w2 * f_t[k] * s * _maclaurin(tmp))
                    f_t = f_t.at[k + 1].set(
                        (q_t[k] * edt[k] ** 2 - kt) / q_t[k + 1])
                    tmp = w4 * edr[k + 1]
                    s = jnp.exp(-tmp)
                    edr = edr.at[k].set(edr[k] * s * s
                                        + w2 * f_r[k] * s * _maclaurin(tmp))
                    f_r = f_r.at[k + 1].set(
                        (q_r[k] * edr[k] ** 2 - kt) / q_r[k + 1])
                edt = edt.at[M - 1].add(w2 * f_t[M - 1])
                edr = edr.at[M - 1].add(w2 * f_r[M - 1])

        rb.update(eta_t=et, eta_r=er, eta_dot_t=edt, eta_dot_r=edr)
        return state.replace(aux={**state.aux, AUX: rb})

    def _nhc_press(self, state: State) -> State:
        rb = dict(state.aux[AUX])
        boltz = self.units.boltz
        kt = boltz * rb["t_tgt"]
        M = self.p_chain
        dim = 3
        tb_mass = kt / (self.p_freq_max * self.p_freq_max)
        q_b = jnp.concatenate([jnp.asarray([dim * dim], state.dtype)
                               * tb_mass,
                               jnp.full((M - 1,), 1.0, state.dtype)
                               * tb_mass])
        eb, edb = rb["eta_b"], rb["eta_dot_b"]
        f_b = jnp.zeros(M, state.dtype)
        for k in range(1, M):
            f_b = f_b.at[k].set((q_b[k - 1] * edb[k - 1] ** 2 - kt)
                                / q_b[k])
        flags = jnp.asarray([float(f) for f in self.p_flag], state.dtype)
        pfreq = jnp.asarray(self.p_freq, state.dtype)
        em = (self.g_f + dim) * kt / (pfreq * pfreq)
        kec = jnp.sum(flags * em * rb["epsilon_dot"] ** 2) / self.pdim
        f_b = f_b.at[0].set((kec - kt) / q_b[0])

        dtv = self.dt
        for _ in range(self.t_iter):
            for wj in _sy_weights(self.t_order):
                w1 = wj * dtv / self.t_iter
                w2, w4 = w1 / 2.0, w1 / 4.0
                edb = edb.at[M - 1].add(w2 * f_b[M - 1])
                for k in range(1, M):
                    tmp = w4 * edb[M - k]
                    s = jnp.exp(-0.5 * tmp)
                    edb = edb.at[M - k - 1].set(
                        edb[M - k - 1] * s * s
                        + w2 * f_b[M - k - 1] * s * _maclaurin(tmp))
                eb = eb + w1 * edb
                for k in range(1, M):
                    f_b = f_b.at[k].set(
                        (q_b[k - 1] * edb[k - 1] ** 2 - kt) / q_b[k])
                for k in range(0, M - 1):
                    tmp = w4 * edb[k + 1]
                    s = jnp.exp(-0.5 * tmp)
                    edb = edb.at[k].set(edb[k] * s * s
                                        + w2 * f_b[k] * s * _maclaurin(tmp))
                    f_b = f_b.at[k + 1].set(
                        (q_b[k] * edb[k] ** 2 - kt) / q_b[k + 1])
                edb = edb.at[M - 1].add(w2 * f_b[M - 1])

        rb.update(eta_b=eb, eta_dot_b=edb)
        return state.replace(aux={**state.aux, AUX: rb})

    # -- barostat (ref: couple / nh_epsilon_dot / remap) --------------------

    def _p_current(self, state: State):
        vol = state.box.volume
        g = state.valid_mask
        m = jnp.where(g, state.per_atom_mass, 0.0)[:, None]
        cvir = state.aux[AUX].get("cvirial", jnp.zeros(6, state.dtype))
        virial = state.virial + cvir
        if self.pcouple == "iso":
            mvv = jnp.sum(m[:, 0] * jnp.sum(state.v * state.v, axis=-1))
            vtr = virial[0] + virial[1] + virial[2]
            avg = ((self.units.mvv2e * mvv + vtr) / (3.0 * vol)
                   * self.units.nktv2p)
            return jnp.stack([avg, avg, avg])
        kin = jnp.sum(m * state.v * state.v, axis=0) * self.units.mvv2e
        ptens = (kin + virial[:3]) / vol * self.units.nktv2p
        if self.pcouple == "xy":
            a = 0.5 * (ptens[0] + ptens[1])
            return jnp.stack([a, a, ptens[2]])
        return ptens

    def _p_hydro(self, state: State):
        run = state.aux.get("nh_run")
        if run is None:
            run = jnp.zeros(2, jnp.int32)
        begin = run[0].astype(state.dtype)
        span = jnp.maximum(run[1].astype(state.dtype) - begin, 1.0)
        delta = jnp.clip(
            (state.ntimestep.astype(state.dtype) - begin) / span, 0.0, 1.0)
        pt = (jnp.asarray(self.p_start, state.dtype)
              + delta * (jnp.asarray(self.p_stop, state.dtype)
                         - jnp.asarray(self.p_start, state.dtype)))
        flags = jnp.asarray([float(f) for f in self.p_flag], state.dtype)
        return pt, jnp.sum(pt * flags) / max(self.pdim, 1)

    def _nh_epsilon_dot(self, state: State, akin_t, akin_r) -> State:
        rb = dict(state.aux[AUX])
        vol = state.box.volume
        mtk1 = (akin_t + akin_r) * self.units.mvv2e / self.g_f
        kt = self.units.boltz * rb["t_tgt"]
        pfreq = jnp.asarray(self.p_freq, state.dtype)
        em = (self.g_f + 3) * kt / (pfreq * pfreq)
        p_cur = self._p_current(state)
        _, p_hydro = self._p_hydro(state)
        scale = jnp.exp(-self.dtq * rb["eta_dot_b"][0])
        flags = jnp.asarray([float(f) for f in self.p_flag], state.dtype)
        f_eps = ((p_cur - p_hydro) * vol / self.units.nktv2p + mtk1) / em
        ed = rb["epsilon_dot"]
        ed = jnp.where(flags > 0, (ed + self.dtq * f_eps) * scale, ed)
        rb["epsilon_dot"] = ed
        return state.replace(aux={**state.aux, AUX: rb})

    def _mtk_term2(self, state: State):
        rb = state.aux[AUX]
        flags = jnp.asarray([float(f) for f in self.p_flag], state.dtype)
        return jnp.sum(flags * rb["epsilon_dot"]) / self.g_f

    def _remap(self, state: State) -> State:
        import dataclasses as _dc

        rb = dict(state.aux[AUX])
        box = state.box
        flags = jnp.asarray([float(f) for f in self.p_flag], state.dtype)
        expfac = jnp.where(flags > 0,
                           jnp.exp(self.dtq * rb["epsilon_dot"]), 1.0)
        center = 0.5 * (box.lo + box.hi)
        lam = box.to_lamda(state.x)
        lam_cm = box.to_lamda(rb["xcm"])
        nb = _dc.replace(box, lo=(box.lo - center) * expfac + center,
                         hi=(box.hi - center) * expfac + center)
        x = nb.to_box(lam)
        x = jnp.where(state.valid_mask[:, None], x, state.x)
        # body COMs dilate with the box (ref: remap -> rfix->deform ->
        # FixRigid::deform x2lamda/lamda2x on xcm)
        rb["xcm"] = nb.to_box(lam_cm)
        return state.replace(x=x, box=nb, aux={**state.aux, AUX: rb})

    # -- hooks (ref: initial_integrate :408 / final_integrate :569) ---------

    def initial_integrate(self, state: State) -> State:
        rb = dict(state.aux[AUX])
        rb["cvirial"] = jnp.zeros(6, state.dtype)
        dt_ = state.dtype
        dtf2 = 2.0 * self.dtf
        scale_t = jnp.ones(3, dt_)
        scale_r = jnp.ones((), dt_)
        scale_v = jnp.full(3, self.dt, dt_)
        if self.tstat:
            scale_t = scale_t * jnp.exp(-self.dtq * rb["eta_dot_t"][0])
            scale_r = scale_r * jnp.exp(-self.dtq * rb["eta_dot_r"][0])
        if self.pstat:
            mtk2 = self._mtk_term2(state)
            scale_t = scale_t * jnp.exp(
                -self.dtq * (rb["epsilon_dot"] + mtk2))
            scale_r = scale_r * jnp.exp(-self.dtq * self.pdim * mtk2)
            tmp = self.dtq * rb["epsilon_dot"]
            scale_v = self.dt * jnp.exp(tmp) * _maclaurin(tmp)

        fcm, torque = self._fcm_torque(state)
        dtfm = self.dtf / rb["masstotal"][:, None]
        vcm = (rb["vcm"] + dtfm * fcm) * scale_t[None, :]
        xcm = rb["xcm"] + scale_v[None, :] * vcm
        akin_t = jnp.sum(rb["masstotal"] * jnp.sum(vcm * vcm, axis=-1))

        def body_rot(q, cq, tq, idiag):
            ex, ey, ez = _q_to_exyz(q)
            tbody = jnp.stack([jnp.dot(tq, ex), jnp.dot(tq, ey),
                               jnp.dot(tq, ez)])
            fquat = _quatvec(q, tbody)
            cq = (cq + dtf2 * fquat) * scale_r
            cq, q = _no_squish_rotate(3, cq, q, idiag, self.dtq)
            cq, q = _no_squish_rotate(2, cq, q, idiag, self.dtq)
            cq, q = _no_squish_rotate(1, cq, q, idiag, self.dt)
            cq, q = _no_squish_rotate(2, cq, q, idiag, self.dtq)
            cq, q = _no_squish_rotate(3, cq, q, idiag, self.dtq)
            ex, ey, ez = _q_to_exyz(q)
            mbody = _invquatvec(q, cq)
            am = 0.5 * (mbody[0] * ex + mbody[1] * ey + mbody[2] * ez)
            w = _angmom_to_omega(am, ex, ey, ez, idiag)
            return q, cq, am, w

        quat, conjqm, angmom, omega = jax.vmap(body_rot)(
            rb["quat"], rb["conjqm"], torque, rb["inertia"])
        akin_r = jnp.sum(angmom * omega)

        rb.update(vcm=vcm, xcm=xcm, quat=quat, conjqm=conjqm,
                  angmom=angmom)
        state = state.replace(aux={**state.aux, AUX: rb})

        if self.tstat:
            rb2 = dict(state.aux[AUX])
            rb2["t_tgt"] = self._t_ramp(state)
            state = state.replace(aux={**state.aux, AUX: rb2})
            state = self._nhc_temp(state, akin_t, akin_r)
        if self.pstat:
            state = self._nhc_press(state)
            state = self._remap(state)
        state = self._set_xv(state, omega)
        if self.pstat:
            state = self._remap(state)
        return state

    def final_integrate(self, state: State) -> State:
        rb = dict(state.aux[AUX])
        dt_ = state.dtype
        dtf2 = 2.0 * self.dtf
        scale_t = jnp.ones(3, dt_)
        scale_r = jnp.ones((), dt_)
        if self.tstat:
            scale_t = scale_t * jnp.exp(-self.dtq * rb["eta_dot_t"][0])
            scale_r = scale_r * jnp.exp(-self.dtq * rb["eta_dot_r"][0])
        if self.pstat:
            mtk2 = self._mtk_term2(state)
            scale_t = scale_t * jnp.exp(
                -self.dtq * (rb["epsilon_dot"] + mtk2))
            scale_r = scale_r * jnp.exp(-self.dtq * self.pdim * mtk2)

        fcm, torque = self._fcm_torque(state)
        dtfm = self.dtf / rb["masstotal"][:, None]
        vcm = rb["vcm"] * scale_t[None, :] + dtfm * fcm
        akin_t = jnp.sum(rb["masstotal"] * jnp.sum(vcm * vcm, axis=-1))

        def body_rot(q, cq, tq, idiag):
            ex, ey, ez = _q_to_exyz(q)
            tbody = jnp.stack([jnp.dot(tq, ex), jnp.dot(tq, ey),
                               jnp.dot(tq, ez)])
            fquat = _quatvec(q, tbody)
            cq = scale_r * cq + dtf2 * fquat
            mbody = _invquatvec(q, cq)
            am = 0.5 * (mbody[0] * ex + mbody[1] * ey + mbody[2] * ez)
            w = _angmom_to_omega(am, ex, ey, ez, idiag)
            return cq, am, w

        conjqm, angmom, omega = jax.vmap(body_rot)(
            rb["quat"], rb["conjqm"], torque, rb["inertia"])
        akin_r = jnp.sum(angmom * omega)
        rb.update(vcm=vcm, conjqm=conjqm, angmom=angmom)
        state = state.replace(aux={**state.aux, AUX: rb})
        state = self._set_v(state, omega)
        if self.pstat:
            pt, _ = self._p_hydro(state)
            state = self._nh_epsilon_dot(state, akin_t, akin_r)
        return state
