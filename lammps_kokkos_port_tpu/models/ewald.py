"""KSpace style ewald: exact structure-factor Ewald summation.

TPU-native re-design of the reference's Ewald solver
(ref: src/KSPACE/ewald.cpp — k-vector enumeration within gsqmx, structure
factors, self/background corrections). Instead of the reference's
incremental cos/sin recursions, the structure factors are dense matmuls
over a static k-vector table — the natural MXU mapping:

    phase = 2*pi * lamda @ n^T          [N, nk]
    Re S  = q @ cos(phase), Im S = q @ sin(phase)
    E     = qqrd2e * sum_k u_k |S_k|^2 + self + background

Forces come from jax.grad of the energy — exact (the energy is smooth),
eliminating an entire class of sign/convention bugs. The k-space virial
uses the standard analytic vterm (ref: ewald.cpp compute virial block).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from ..utils.units import get_units

Array = jax.Array


def g_ewald_estimate(accuracy_rel: float, cutoff: float, q2: float = 1.0,
                     natoms: int = 1, volume: float = 1.0) -> float:
    """Default splitting parameter (ref: pppm.cpp/ewald.cpp fallback:
    g = (1.35 - 0.15 log(accuracy)) / cutoff)."""
    return (1.35 - 0.15 * np.log(accuracy_rel)) / cutoff


def choose_kmax(g_ewald: float, prd: np.ndarray, accuracy_rel: float
                ) -> tuple[int, int, int]:
    """Per-dim max integer k index so truncated tail < accuracy.

    Uses the standard error criterion: modes with exp(-k^2/(4g^2)) below
    ~accuracy are dropped (the reference solves an error model per dim,
    ewald.cpp setup; this conservative cut matches it closely).
    """
    kcut = 2.0 * g_ewald * np.sqrt(max(-np.log(accuracy_rel), 1.0))
    kmax = np.ceil(kcut * prd / (2.0 * np.pi)).astype(int)
    return tuple(int(max(1, k)) for k in kmax)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["nvec", "ug", "ksq", "kunit"],
    meta_fields=["g_ewald", "accuracy", "dynamic", "slabflag",
                 "slab_volfactor"],
)
@dataclasses.dataclass(frozen=True)
class Ewald:
    """Static k-space tables. nvec: [nk,3] integer modes (half-space, the
    conjugate half is folded into a factor 2 in ug).

    With `dynamic` set (barostat active), the k vectors and mode energies
    are re-derived from state.box at every force evaluation — the analog of
    the reference re-running KSpace::setup() after each NPT box remap
    (ref: src/fix_nh.cpp:874-876). The INTEGER mode set stays the one
    selected for the creation box (valid for modest volume drift)."""

    nvec: Array  # [nk, 3] float (integer values)
    ug: Array  # [nk] 4*pi/V * exp(-k^2/4g^2)/k^2 * (2 for half-space)
    ksq: Array  # [nk]
    kunit: Array  # [nk, 3] k vectors
    g_ewald: float
    accuracy: float
    dynamic: bool = False
    # 2d slab handling (ref: kspace_modify slab): 1 = EW3Dc correction
    # (expanded z volume + dipole term, ewald.cpp:1173 slabcorr);
    # 2 = nozforce (z forces zeroed, ewald.cpp:447)
    slabflag: int = 0
    slab_volfactor: float = 1.0

    @staticmethod
    def create(box, g_ewald: float, accuracy_rel: float = 1e-6,
               dtype=jnp.float64, dynamic: bool = False) -> "Ewald":
        hinv = np.asarray(jax.device_get(box.h_inv))
        prd = np.asarray(jax.device_get(box.prd))
        vol = float(np.asarray(jax.device_get(box.volume)))
        kx, ky, kz = choose_kmax(g_ewald, prd, accuracy_rel)

        # half-space enumeration (kx>0, or kx=0 & ky>0, or kx=ky=0 & kz>0)
        ns = []
        for n1 in range(0, kx + 1):
            for n2 in range(-ky, ky + 1):
                for n3 in range(-kz, kz + 1):
                    if n1 == 0:
                        if n2 < 0 or (n2 == 0 and n3 <= 0):
                            continue
                    ns.append((n1, n2, n3))
        ns = np.asarray(ns, dtype=np.float64)
        # k = 2 pi * hinv^T n (reciprocal lattice)
        kvec = 2.0 * np.pi * ns @ hinv
        ksq = (kvec**2).sum(axis=1)
        gsqmx = (2.0 * g_ewald * np.sqrt(max(-np.log(accuracy_rel), 1.0))) ** 2
        keep = ksq <= gsqmx * 1.0001
        ns, kvec, ksq = ns[keep], kvec[keep], ksq[keep]

        pref = 4.0 * np.pi / vol
        ug = 2.0 * pref * np.exp(-ksq / (4.0 * g_ewald**2)) / ksq

        return Ewald(
            nvec=jnp.asarray(ns, dtype=dtype),
            ug=jnp.asarray(ug, dtype=dtype),
            ksq=jnp.asarray(ksq, dtype=dtype),
            kunit=jnp.asarray(kvec, dtype=dtype),
            g_ewald=float(g_ewald),
            accuracy=float(accuracy_rel),
            dynamic=dynamic,
        )

    @staticmethod
    def create_reference(box, g_ewald: float, accuracy_rel: float,
                         natoms: int, qsqsum: float, qqrd2e: float,
                         dtype=jnp.float64, dynamic: bool = False,
                         slabflag: int = 0,
                         slab_volfactor: float = 1.0) -> "Ewald":
        """Mode selection replicating the reference bit-for-bit: per-dim
        kmax from the rms error loops (ref: src/KSPACE/ewald.cpp:230-266,
        rms :341-349), gsqmx = max per-dim k^2, inclusive sqk <= gsqmx
        enumeration — so the k-vector SET matches the reference's and the
        k-space forces agree to f64 roundoff (used by the kspace-*.yaml
        fixture replays)."""
        hinv = np.asarray(jax.device_get(box.h_inv))
        prd = np.asarray(jax.device_get(box.prd)).copy()
        prd[2] *= slab_volfactor  # slab mode: z expanded (ewald.cpp:157)
        hinv = hinv.copy()
        hinv[2] /= slab_volfactor
        vol = float(np.asarray(jax.device_get(box.volume))) * slab_volfactor
        # accuracy is ABSOLUTE: accuracy_rel * two_charge_force
        # (ref: src/kspace.cpp:169 two_charge; qelectron = angstrom = 1
        # in real/metal units)
        accuracy = accuracy_rel * qqrd2e
        q2 = qsqsum * qqrd2e
        n = max(int(natoms), 1)

        def rms(km, prd_d):
            return (2.0 * q2 * g_ewald / prd_d
                    * np.sqrt(1.0 / (np.pi * km * n))
                    * np.exp(-np.pi ** 2 * km ** 2
                             / (g_ewald ** 2 * prd_d ** 2)))

        kmaxs = []
        for d in range(3):
            km = 1
            while rms(km, prd[d]) > accuracy:
                km += 1
            kmaxs.append(km)
        unitk = 2.0 * np.pi / prd
        gsqmx = max(unitk[d] ** 2 * kmaxs[d] ** 2 for d in range(3))
        gsqmx *= 1.00001  # ref: ewald.cpp:310
        if box.triclinic:
            # scale enumeration bounds for skew via |H|^T
            # (ref: ewald.cpp:274-283 lamda2xT)
            h = np.asarray(jax.device_get(box.h))
            habs = np.abs(h)
            t0 = kmaxs[0] / prd[0]
            t1 = kmaxs[1] / prd[1]
            t2 = kmaxs[2] / prd[2]
            kmaxs = [max(1, int(h[0, 0] * t0)),
                     max(1, int(habs[0, 1] * t0 + h[1, 1] * t1)),
                     max(1, int(habs[0, 2] * t0 + habs[1, 2] * t1
                                + h[2, 2] * t2))]
        kx, ky, kz = kmaxs
        kmax = max(kmaxs)

        # half-space; pure-axis modes range to the GLOBAL kmax, exactly
        # like the reference's (k,0,0)/(0,l,0)/(0,0,m) loops (coeffs())
        ns = set()
        for m in range(1, kmax + 1):
            ns.add((m, 0, 0))
            ns.add((0, m, 0))
            ns.add((0, 0, m))
        for n1 in range(0, kx + 1):
            for n2 in range(-ky, ky + 1):
                for n3 in range(-kz, kz + 1):
                    if n1 == 0:
                        if n2 < 0 or (n2 == 0 and n3 <= 0):
                            continue
                    ns.add((n1, n2, n3))
        ns = np.asarray(sorted(ns), dtype=np.float64)
        kvec = 2.0 * np.pi * ns @ hinv
        ksq = (kvec ** 2).sum(axis=1)
        keep = ksq <= gsqmx  # inclusive (ref coeffs())
        ns, kvec, ksq = ns[keep], kvec[keep], ksq[keep]

        pref = 4.0 * np.pi / vol
        ug = 2.0 * pref * np.exp(-ksq / (4.0 * g_ewald ** 2)) / ksq
        # phases use fractional coords of the REAL box: z modes live on
        # the slab-expanded box, so their integer index scales down
        ns = ns.copy()
        ns[:, 2] /= slab_volfactor
        return Ewald(
            nvec=jnp.asarray(ns, dtype=dtype),
            ug=jnp.asarray(ug, dtype=dtype),
            ksq=jnp.asarray(ksq, dtype=dtype),
            kunit=jnp.asarray(kvec, dtype=dtype),
            g_ewald=float(g_ewald), accuracy=float(accuracy_rel),
            dynamic=dynamic, slabflag=slabflag,
            slab_volfactor=slab_volfactor,
        )

    # -- energy/forces -------------------------------------------------------

    def _tables(self, state: State):
        """(ug, ksq, kunit) for the CURRENT box (traced when dynamic)."""
        if not self.dynamic:
            return self.ug, self.ksq, self.kunit
        kvec = 2.0 * jnp.pi * (self.nvec @ state.box.h_inv)
        ksq = jnp.sum(kvec * kvec, axis=1)
        ug = (2.0 * 4.0 * jnp.pi / state.box.volume
              * jnp.exp(-ksq / (4.0 * self.g_ewald**2)) / ksq)
        return ug, ksq, kvec

    def _kspace_energy(self, x: Array, state: State, ug: Array) -> Array:
        """0.5 * sum_k u_k |S(k)|^2 (both half-spaces via the 2 in ug)."""
        q = jnp.where(state.valid_mask, state.q, 0.0)
        lam = state.box.to_lamda(x)
        phase = 2.0 * jnp.pi * (lam @ self.nvec.T)  # [cap, nk]
        re = q @ jnp.cos(phase)
        im = q @ jnp.sin(phase)
        return 0.5 * jnp.sum(ug * (re * re + im * im))

    def _corrections(self, state: State) -> Array:
        """Self-energy + charged-background terms (ref: ewald.cpp compute)."""
        q = jnp.where(state.valid_mask, state.q, 0.0)
        qsqsum = jnp.sum(q * q)
        qsum = jnp.sum(q)
        g = self.g_ewald
        vol = state.box.volume
        e_self = -g / jnp.sqrt(jnp.pi) * qsqsum
        e_bg = -jnp.pi / (2.0 * vol * g * g) * qsum * qsum
        return e_self + e_bg

    def compute(self, state: State, eflag: bool, vflag: bool):
        qqrd2e = get_units(state.units_name).qqr2e
        ug, ksq, kunit = self._tables(state)

        def energy_of(x):
            e = self._kspace_energy(x, state, ug)
            if self.slabflag == 1:
                # EW3Dc dipole correction (ref: ewald.cpp:1173 slabcorr);
                # its gradient IS the reference's force correction
                q = jnp.where(state.valid_mask, state.q, 0.0)
                qsum = jnp.sum(q)
                zs = x[:, 2]
                dipole = jnp.sum(q * zs)
                dip_r2 = jnp.sum(q * zs * zs)
                zprd_slab = state.box.prd[2] * self.slab_volfactor
                vol_s = state.box.volume * self.slab_volfactor
                e = e + 2.0 * jnp.pi / vol_s * (
                    dipole * dipole - qsum * dip_r2
                    - qsum * qsum * zprd_slab * zprd_slab / 12.0)
            return qqrd2e * e

        e_k, neg_f = jax.value_and_grad(energy_of)(state.x)
        f = -neg_f
        if self.slabflag == 2:  # nozforce (ref: ewald.cpp:447)
            f = f.at[:, 2].set(0.0)

        pe = None
        if eflag:
            pe = e_k + qqrd2e * self._corrections(state)

        virial = None
        if vflag:
            # analytic k-space virial (ref: ewald.cpp vterm block)
            q = jnp.where(state.valid_mask, state.q, 0.0)
            lam = state.box.to_lamda(state.x)
            phase = 2.0 * jnp.pi * (lam @ self.nvec.T)
            re = q @ jnp.cos(phase)
            im = q @ jnp.sin(phase)
            s2 = re * re + im * im
            uk = 0.5 * ug * s2 * qqrd2e
            vterm = -2.0 * (1.0 / ksq + 0.25 / (self.g_ewald**2))
            k = kunit
            v = []
            for a, b in ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)):
                delta = 1.0 if a == b else 0.0
                v.append(jnp.sum(uk * (delta + vterm * k[:, a] * k[:, b])))
            virial = jnp.stack(v)
        return f, pe, virial
