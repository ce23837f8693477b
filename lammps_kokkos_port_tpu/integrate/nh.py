"""Nose-Hoover thermostat/barostat integrators: fix nvt / npt / nph.

TPU-native re-implementation of the reference's FixNH family
(ref: src/fix_nh.cpp — thermostat chain `nhc_temp_integrate` :1762,
barostat `nh_omega_dot` :2251, half-step box `remap()` :1068, MTK terms;
Kokkos twin src/KOKKOS/fix_nh_kokkos.cpp keeps chain scalars on host — here
they are tiny device arrays inside state.aux, so the whole step stays one
compiled graph).

Chain state layout (state.aux["nh"]):
    eta       [mtchain]    thermostat chain positions
    eta_dot   [mtchain+1]  chain velocities (last entry pinned 0)
    etap      [mpchain]    barostat-thermostat chain positions
    etap_dot  [mpchain+1]
    omega     [6]          barostat strain bookkeeping
    omega_dot [6]          barostat strain rates (Voigt)

The integration order reproduces FixNH::initial_integrate/final_integrate
exactly (ref: fix_nh.cpp:828-884): press chain -> temp chain -> T,P ->
omega_dot -> v press-scale -> nve_v -> remap -> nve_x -> remap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..compute import thermo as thermo_mod
from ..core.state import State
from .verlet import Integrator

Array = jax.Array

AUX_KEY = "nh"


@dataclasses.dataclass(frozen=True)
class FixNVT(Integrator):
    """fix nvt: Nose-Hoover thermostat chains (no barostat).

    temp ramp: t_target interpolates t_start -> t_stop over the run window
    (ref: FixNH::compute_temp_target) using aux["nh_run"] = (begin, end)
    installed by the runner.
    """

    t_start: float = 1.0
    t_stop: float = 1.0
    t_period: float = 1.0  # Tdamp
    mtchain: int = 3
    nc_tchain: int = 1
    drag: float = 0.0
    extra_dof: int | None = None

    @property
    def tbit(self) -> int:
        """Group bit for the fix's TEMPERATURE/PRESSURE sensing.
        fix nvt senses its own group (fix_nvt.cpp:34 creates
        `compute .. <group> temp`); fix npt/nph sense group ALL
        (fix_npt.cpp:35 / fix_nph.cpp:35 create `compute .. all temp`)
        even when integrating a subgroup — FixNPT overrides."""
        return self.groupbit

    @property
    def t_freq(self) -> float:
        return 1.0 / self.t_period

    @property
    def tdrag_factor(self) -> float:
        return 1.0 - (self.dt * self.t_freq * self.drag / self.nc_tchain)

    # -- aux state -----------------------------------------------------------

    def setup(self, state: State) -> State:
        dt = state.dtype
        aux = dict(state.aux)
        aux[AUX_KEY] = {
            "eta": jnp.zeros(self.mtchain, dtype=dt),
            "eta_dot": jnp.zeros(self.mtchain + 1, dtype=dt),
            # PERSISTENT members (ref: FixNH keeps t_current and
            # eta_dotdot across calls; the thermostat's in-chain
            # bookkeeping t_current *= factor^2 feeds the next
            # initial_integrate, and eta_dotdot[1:] is never refreshed
            # at entry)
            "t_cur": jnp.zeros((), dtype=dt),
            "t_tgt": jnp.zeros((), dtype=dt),
            "eta_dotdot": jnp.zeros(self.mtchain, dtype=dt),
        }
        aux.setdefault("nh_run", jnp.zeros(2, dtype=jnp.int32))
        return self.refresh_segment(state.replace(aux=aux))

    def refresh_segment(self, state: State) -> State:
        """Per-run-segment re-setup (ref: FixNH::setup): fresh-measure
        t_current and the thermostat chain's initial forces."""
        nh = dict(state.aux[AUX_KEY])
        nh["t_cur"] = self._t_current(state)
        # the t_target MEMBER (ref: compute_temp_target at setup); during
        # a run it is refreshed at each initial_integrate AFTER the press
        # chain ran (fix_nh.cpp:832-838 order), so the press chain always
        # sees the previous half-step's value
        nh["t_tgt"] = self._t_target(state)
        kt = self.units.boltz * self._t_target(state)
        qk = kt / (self.t_freq * self.t_freq)
        q0 = self._tdof(state) * kt / (self.t_freq * self.t_freq)
        edd = nh["eta_dotdot"]
        for ich in range(1, self.mtchain):
            qprev = q0 if ich == 1 else qk
            edd = edd.at[ich].set(
                (qprev * nh["eta_dot"][ich - 1] ** 2 - kt) / qk)
        nh["eta_dotdot"] = edd
        return state.replace(aux={**state.aux, AUX_KEY: nh})

    # -- helpers -------------------------------------------------------------

    def _tdof(self, state: State) -> Array:
        """Thermostatted DOF: group-scoped (ref: the fix's own temperature
        compute runs on its group, src/fix_nh.cpp:519 + compute_temp.cpp
        dof_compute: dim*N_group - extra)."""
        dim = state.dimension
        extra = self.extra_dof if self.extra_dof is not None else dim
        g = state.valid_mask & state.group_mask(self.tbit)
        return dim * jnp.sum(g).astype(state.dtype) - extra

    def _t_target(self, state: State) -> Array:
        # ensemble override: parallel tempering swaps targets per replica
        # at runtime (ref: temper.cpp:183 whichfix->reset_target)
        if "t_target" in state.aux:
            return state.aux["t_target"].astype(state.dtype)
        run = state.aux["nh_run"]
        begin = run[0].astype(state.dtype)
        end = run[1].astype(state.dtype)
        span = jnp.maximum(end - begin, 1.0)
        delta = jnp.clip(
            (state.ntimestep.astype(state.dtype) - begin) / span, 0.0, 1.0
        )
        return self.t_start + delta * (self.t_stop - self.t_start)

    def _t_current(self, state: State) -> Array:
        g = state.valid_mask & state.group_mask(self.tbit)
        m = jnp.where(g, state.per_atom_mass, 0.0)
        ke = jnp.sum(m * jnp.sum(state.v * state.v, axis=-1))
        return self.units.mvv2e * ke / (
            jnp.maximum(self._tdof(state), 1.0) * self.units.boltz)

    def _nhc_temp_integrate(self, state: State) -> State:
        """One half-step of the thermostat chain + velocity rescale
        (ref: FixNH::nhc_temp_integrate, src/fix_nh.cpp:1762)."""
        boltz = self.units.boltz
        dt4 = 0.5 * self.dt / 2.0
        dt8 = dt4 / 2.0
        dthalf = 0.5 * self.dt
        M = self.mtchain

        nh = state.aux[AUX_KEY]
        eta = nh["eta"]
        eta_dot = nh["eta_dot"]

        tdof = self._tdof(state)
        t_target = nh["t_tgt"]  # member, set by compute_temp_target timing
        # PERSISTENT bookkeeping value, NOT a fresh measurement: carries
        # the previous call's in-chain *= factor^2 scaling (exact only
        # when the sensed group equals the scaled group; the reference
        # keeps the approximation — fix_nh.cpp:1807 comment)
        t_current = nh["t_cur"]
        ke_target = tdof * boltz * t_target

        # masses preserve initial freq (eta_mass_flag default on)
        q0 = tdof * boltz * t_target / (self.t_freq * self.t_freq)
        qk = boltz * t_target / (self.t_freq * self.t_freq)

        kecurrent = tdof * boltz * t_current
        # eta_dotdot[1:] persists across calls (no entry refresh)
        eta_dotdot = nh["eta_dotdot"]
        eta_dotdot = eta_dotdot.at[0].set((kecurrent - ke_target) / q0)

        ncfac = 1.0 / self.nc_tchain
        v = state.v
        scale_total = jnp.ones((), dtype=state.dtype)

        for _ in range(self.nc_tchain):
            for ich in range(M - 1, 0, -1):
                expfac = jnp.exp(-ncfac * dt8 * eta_dot[ich + 1])
                ed = eta_dot[ich] * expfac
                ed = ed + eta_dotdot[ich] * ncfac * dt4
                ed = ed * self.tdrag_factor * expfac
                eta_dot = eta_dot.at[ich].set(ed)

            expfac = jnp.exp(-ncfac * dt8 * eta_dot[1])
            ed0 = eta_dot[0] * expfac
            ed0 = ed0 + eta_dotdot[0] * ncfac * dt4
            ed0 = ed0 * self.tdrag_factor * expfac
            eta_dot = eta_dot.at[0].set(ed0)

            factor_eta = jnp.exp(-ncfac * dthalf * eta_dot[0])
            scale_total = scale_total * factor_eta

            t_current = t_current * factor_eta * factor_eta
            kecurrent = tdof * boltz * t_current
            eta_dotdot = eta_dotdot.at[0].set((kecurrent - ke_target) / q0)

            eta = eta + ncfac * dthalf * eta_dot[:M]

            ed0 = eta_dot[0] * expfac
            ed0 = ed0 + eta_dotdot[0] * ncfac * dt4
            ed0 = ed0 * expfac
            eta_dot = eta_dot.at[0].set(ed0)

            for ich in range(1, M):
                expfac = jnp.exp(-ncfac * dt8 * eta_dot[ich + 1])
                ed = eta_dot[ich] * expfac
                qprev = q0 if ich == 1 else qk
                edd = (qprev * eta_dot[ich - 1] ** 2 - boltz * t_target) / qk
                eta_dotdot = eta_dotdot.at[ich].set(edd)
                ed = ed + edd * ncfac * dt4
                ed = ed * expfac
                eta_dot = eta_dot.at[ich].set(ed)

        # nh_v_temp: scale group velocities by the accumulated factor
        aux = dict(state.aux)
        aux[AUX_KEY] = {**nh, "eta": eta, "eta_dot": eta_dot,
                        "eta_dotdot": eta_dotdot, "t_cur": t_current}
        state = state.replace(aux=aux)
        return self._apply_v_scale(state, scale_total)

    def _apply_v_scale(self, state: State, scale) -> State:
        """nh_v_temp velocity update — SLLOD variants override."""
        gmask = self._gmask(state)
        v = jnp.where(gmask, state.v * scale, state.v)
        return state.replace(v=v)

    tstat: bool = True  # fix nph disables compute_temp_target

    def _update_t_target(self, state: State) -> State:
        """compute_temp_target (ref: fix_nh.cpp:1720): refresh the
        t_target member from the ramp — only when thermostatting."""
        if not self.tstat:
            return state
        nh = dict(state.aux[AUX_KEY])
        nh["t_tgt"] = self._t_target(state)
        return state.replace(aux={**state.aux, AUX_KEY: nh})

    # -- hooks (ref: FixNH::initial_integrate/final_integrate) ---------------

    def initial_integrate(self, state: State) -> State:
        state = self._update_t_target(state)
        state = self._nhc_temp_integrate(state)
        state = self.nve_v(state)
        state = self.nve_x(state)
        return state

    def _measure_t_cur(self, state: State) -> State:
        # final_integrate fresh-measures the persistent t_current member
        # (ref: fix_nh.cpp final_integrate `t_current =
        # temperature->compute_scalar()`)
        nh = dict(state.aux[AUX_KEY])
        nh["t_cur"] = self._t_current(state)
        return state.replace(aux={**state.aux, AUX_KEY: nh})

    def final_integrate(self, state: State) -> State:
        state = self.nve_v(state)
        state = self._measure_t_cur(state)
        state = self._nhc_temp_integrate(state)
        return state

    def thermostat_energy(self, state: State) -> Array:
        """e_conserved contribution (ref: FixNH::compute_scalar thermostat
        part): ke_target*eta[0] + sum_k>0 kT*eta[k] + sum 0.5*Q_k eta_dot^2."""
        boltz = self.units.boltz
        nh = state.aux[AUX_KEY]
        tdof = self._tdof(state)
        t_target = self._t_target(state)
        kt = boltz * t_target
        q0 = tdof * kt / (self.t_freq * self.t_freq)
        qk = kt / (self.t_freq * self.t_freq)
        e = tdof * kt * nh["eta"][0] + 0.5 * q0 * nh["eta_dot"][0] ** 2
        for ich in range(1, self.mtchain):
            e = e + kt * nh["eta"][ich] + 0.5 * qk * nh["eta_dot"][ich] ** 2
        return e


@dataclasses.dataclass(frozen=True)
class FixNPT(FixNVT):
    """fix npt: Nose-Hoover thermostat + barostat, iso/aniso coupling on an
    orthogonal box (triclinic coupling arrives with the triclinic force
    paths). pstyle ISO couples xyz to the scalar pressure; aniso controls
    each diagonal independently (ref: FixNH couple()/nh_omega_dot()).
    """

    # 6-component Voigt-ordered barostat targets: (x, y, z, yz, xz, xy)
    # — indices 3..5 follow the reference's omega/h ordering
    p_start: tuple = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    p_stop: tuple = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    p_period: tuple = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    p_flag: tuple = (True, True, True, False, False, False)
    pcouple: str = "iso"  # iso | aniso | xy | yz | xz (couple styles)
    dilate_all: bool = True     # ref: allremap (dilate all vs a group)
    dilate_groupbit: int = 1
    p_temp: float | None = None  # ptemp: barostat reference temperature
    fixed_point: tuple | None = None  # ref: fixedpoint (default box center)
    mpchain: int = 3

    @property
    def tbit(self) -> int:
        # fix npt/nph sense GLOBAL temperature/pressure (their temp and
        # pressure computes are created on group all, fix_npt.cpp:35,
        # fix_nph.cpp:35) even when integrating a subgroup
        return 1
    nc_pchain: int = 1
    mtk: bool = True
    needs_virial: bool = True

    @property
    def p_freq(self):
        return tuple((1.0 / p) if p else 0.0 for p in self._p6("p_period"))

    def _p6(self, name):
        v = tuple(getattr(self, name))
        if len(v) == 6:
            return v
        pad = (False,) * 3 if name == "p_flag" else \
            ((1.0,) * 3 if name == "p_period" else (0.0,) * 3)
        return v + pad

    @property
    def p_flag6(self):
        return self._p6("p_flag")

    @property
    def triclinic(self) -> bool:
        return any(self.p_flag6[3:])

    @property
    def p_freq_max(self) -> float:
        return max(f for f, on in zip(self.p_freq, self.p_flag6) if on)

    @property
    def pdim(self) -> int:
        # of COUPLED (diagonal) dims (ref: pdim counts p_flag[0..2])
        return sum(1 for on in self.p_flag6[:3] if on)

    @property
    def pdof(self) -> int:
        # all flagged dims incl. tilts (ref: nhc_press_integrate pdof)
        return sum(1 for on in self.p_flag6 if on)

    @property
    def pdrag_factor(self) -> float:
        return 1.0 - (self.dt * self.p_freq_max * self.drag / self.nc_pchain)

    def setup(self, state: State) -> State:
        state = super().setup(state)
        dt = state.dtype
        aux = dict(state.aux)
        nh = dict(aux[AUX_KEY])
        nh.update({
            "etap": jnp.zeros(self.mpchain, dtype=dt),
            "etap_dot": jnp.zeros(self.mpchain + 1, dtype=dt),
            "omega": jnp.zeros(6, dtype=dt),
            "omega_dot": jnp.zeros(6, dtype=dt),
            "etap_dotdot": jnp.zeros(self.mpchain, dtype=dt),
            # reference volume for the PV strain-energy term
            # (ref: FixNH::setup vol0 / compute_scalar)
            "vol0": state.box.volume.astype(dt),
        })
        aux[AUX_KEY] = nh
        state = state.replace(aux=aux)
        # barostat masses are FROZEN at segment setup (omega_mass_flag=0 /
        # etap_mass_flag=0 defaults, fix_nh.cpp:84-85,797-822) — only the
        # thermostat's eta_mass tracks the ramped t_target
        return self.refresh_segment(state)

    def refresh_segment(self, state: State) -> State:
        """Recompute frozen barostat masses from t_target at the CURRENT
        step — called at every run-segment setup like FixNH::setup
        (the run command resets beginstep/endstep first)."""
        state = super().refresh_segment(state)
        nh = dict(state.aux[AUX_KEY])
        if "etap_dot" not in nh:
            return state  # mid-construction: barostat keys arrive next
        kt = self.units.boltz * self._t_target(state)
        nkt = (state.nlocal.astype(state.dtype) + 1.0) * kt
        pfreq = jnp.asarray(
            [f if f else 1.0 for f in self.p_freq], state.dtype)
        nh["omega_mass"] = nkt / (pfreq * pfreq)
        nh["etap_kt"] = kt
        # initial chain forces (ref: FixNH::setup etap_dotdot block)
        if self.mpchain:
            em = kt / (self.p_freq_max * self.p_freq_max)
            edd = nh["etap_dotdot"]
            for ich in range(1, self.mpchain):
                edd = edd.at[ich].set(
                    (em * nh["etap_dot"][ich - 1] ** 2 - kt) / em)
            nh["etap_dotdot"] = edd
        return state.replace(aux={**state.aux, AUX_KEY: nh})

    # -- pressure plumbing ---------------------------------------------------

    def _p_target(self, state: State):
        run = state.aux["nh_run"]
        begin = run[0].astype(state.dtype)
        end = run[1].astype(state.dtype)
        span = jnp.maximum(end - begin, 1.0)
        delta = jnp.clip(
            (state.ntimestep.astype(state.dtype) - begin) / span, 0.0, 1.0
        )
        p0 = jnp.asarray(self._p6("p_start"), state.dtype)
        p1 = jnp.asarray(self._p6("p_stop"), state.dtype)
        pt = p0 + delta * (p1 - p0)
        dflags = jnp.asarray([float(f) for f in self.p_flag6[:3]],
                             state.dtype)
        p_hydro = jnp.sum(pt[:3] * dflags) / max(self.pdim, 1)
        return pt, p_hydro

    def _p_current(self, state: State):
        """Coupled current pressure: GROUP KE tensor + global virial
        (ref: the fix's pressure compute uses its group-scoped temp
        compute's KE tensor, fix_nh.cpp:519-545 + compute_pressure.cpp
        compute_vector; couple() then averages per pcouple)."""
        vol = state.box.volume
        if self.pcouple == "iso":
            # ISO uses the SCALAR pressure: dof-scaled group temperature,
            # not the raw mvv tensor (ref: compute_pressure.cpp
            # compute_scalar keflag branch)
            tdof = self._tdof(state)
            t_cur = self._t_current(state)
            vtrace = state.virial[0] + state.virial[1] + state.virial[2]
            avg = ((tdof * self.units.boltz * t_cur + vtrace)
                   / (3.0 * vol) * self.units.nktv2p)
            return jnp.stack([avg, avg, avg])  # iso never has tilts
        kin = self._mvv_current(state)  # group Voigt diag, mvv2e applied
        ptens = (kin + state.virial[:3]) / vol * self.units.nktv2p
        if self.pcouple == "xy":
            avg = 0.5 * (ptens[0] + ptens[1])
            diag = jnp.stack([avg, avg, ptens[2]])
        elif self.pcouple == "yz":
            avg = 0.5 * (ptens[1] + ptens[2])
            diag = jnp.stack([ptens[0], avg, avg])
        elif self.pcouple == "xz":
            avg = 0.5 * (ptens[0] + ptens[2])
            diag = jnp.stack([avg, ptens[1], avg])
        else:
            diag = ptens
        if not self.triclinic:
            return diag
        # off-diagonal components, reordered xy-xz-yz -> yz,xz,xy to the
        # omega/h Voigt convention (ref: couple() tail)
        off = (self._mvv_offdiag(state) + state.virial[3:6]) \
            / vol * self.units.nktv2p
        return jnp.concatenate([diag, off[::-1]])

    def _mvv_current(self, state: State):
        g = state.valid_mask & state.group_mask(self.tbit)
        m = state.per_atom_mass[:, None]
        v = jnp.where(g[:, None], state.v, 0.0)
        return jnp.sum(m * v * v, axis=0) * self.units.mvv2e

    def _mvv_offdiag(self, state: State):
        """Group KE tensor off-diagonal (xy, xz, yz), mvv2e applied —
        the sphere variant adds rotational terms."""
        g = state.valid_mask & state.group_mask(self.tbit)
        m = jnp.where(g, state.per_atom_mass, 0.0)
        v = state.v
        kxy = jnp.sum(m * v[:, 0] * v[:, 1]) * self.units.mvv2e
        kxz = jnp.sum(m * v[:, 0] * v[:, 2]) * self.units.mvv2e
        kyz = jnp.sum(m * v[:, 1] * v[:, 2]) * self.units.mvv2e
        return jnp.stack([kxy, kxz, kyz])

    def _nh_omega_dot(self, state: State) -> State:
        """Barostat strain-rate update (ref: FixNH::nh_omega_dot)."""
        boltz, nktv2p = self.units.boltz, self.units.nktv2p
        dthalf = 0.5 * self.dt
        nh = state.aux[AUX_KEY]
        omega_dot = nh["omega_dot"]

        vol = state.box.volume
        omega_mass = nh["omega_mass"]  # frozen at segment setup

        p_current = self._p_current(state)
        _, p_hydro = self._p_target(state)

        mtk_term1 = jnp.zeros((), state.dtype)
        if self.mtk:
            if self.pcouple == "iso":
                tdof = self._tdof(state)
                # the PERSISTENT t_current member: in-chain bookkeeping at
                # initial_integrate, fresh-measured by final_integrate
                # (ref: nh_omega_dot reads this->t_current, which
                # initial_integrate does NOT re-assign)
                t_current = nh["t_cur"]
                mtk_term1 = (tdof * boltz * t_current) / (
                    self.pdim * state.nlocal.astype(state.dtype)
                )
            else:
                mvv = self._mvv_current(state)
                dflags = jnp.asarray([float(f) for f in self.p_flag6[:3]],
                                     state.dtype)
                mtk_term1 = jnp.sum(mvv * dflags) / (
                    self.pdim * state.nlocal.astype(state.dtype)
                )

        new_od = omega_dot[:3]
        f_omega = ((p_current[:3] - p_hydro) * vol
                   / (omega_mass[:3] * nktv2p)
                   + mtk_term1 / omega_mass[:3])
        dflags = jnp.asarray([float(f) for f in self.p_flag6[:3]],
                             state.dtype)
        new_od = jnp.where(
            dflags > 0, (new_od + f_omega * dthalf) * self.pdrag_factor,
            new_od
        )
        omega_dot = omega_dot.at[:3].set(new_od)
        if self.triclinic:
            # tilt rates: no p_hydro, no MTK (ref: nh_omega_dot tail)
            oflags = jnp.asarray([float(f) for f in self.p_flag6[3:]],
                                 state.dtype)
            f_off = p_current[3:6] * vol / (omega_mass[3:6] * nktv2p)
            new_off = jnp.where(
                oflags > 0,
                (omega_dot[3:6] + f_off * dthalf) * self.pdrag_factor,
                omega_dot[3:6])
            omega_dot = omega_dot.at[3:6].set(new_off)

        aux = dict(state.aux)
        aux[AUX_KEY] = {**nh, "omega_dot": omega_dot}
        return state.replace(aux=aux)

    def _mtk_term2(self, state: State) -> Array:
        if not self.mtk:
            return jnp.zeros((), state.dtype)
        od = state.aux[AUX_KEY]["omega_dot"]
        dflags = jnp.asarray([float(f) for f in self.p_flag6[:3]],
                             state.dtype)
        return jnp.sum(od[:3] * dflags) / (
            self.pdim * state.nlocal.astype(state.dtype)
        )

    def _nh_v_press(self, state: State) -> State:
        """Scale velocities by the barostat rates (ref: FixNH::nh_v_press)."""
        dt4 = 0.25 * self.dt
        dthalf = 0.5 * self.dt
        od = state.aux[AUX_KEY]["omega_dot"]
        mtk2 = self._mtk_term2(state)
        factor = jnp.exp(-dt4 * (od[:3] + mtk2))
        gmask = self._gmask(state)
        v = state.v * factor[None, :]
        if self.triclinic:
            # shear coupling between the two half scalings
            # (ref: nh_v_press TRICLINIC block; od[3]=yz, od[4]=xz,
            # od[5]=xy rates)
            vx = v[:, 0] - dthalf * (v[:, 1] * od[5] + v[:, 2] * od[4])
            vy = v[:, 1] - dthalf * v[:, 2] * od[3]
            v = jnp.stack([vx, vy, v[:, 2]], axis=-1)
        v = v * factor[None, :]
        v = jnp.where(gmask, v, state.v)
        return state.replace(v=v)

    def _nhc_press_integrate(self, state: State) -> State:
        """Barostat-thermostat chain (ref: FixNH::nhc_press_integrate)."""
        if self.mpchain == 0:
            return state  # pchain 0: undamped barostat (ref: mpchain check)
        boltz = self.units.boltz
        dt4 = 0.5 * self.dt / 2.0
        dt8 = dt4 / 2.0
        dthalf = 0.5 * self.dt
        M = self.mpchain

        nh = state.aux[AUX_KEY]
        etap = nh["etap"]
        etap_dot = nh["etap_dot"]
        omega_dot = nh["omega_dot"]

        t_target = nh["t_tgt"]  # the MEMBER: at initial_integrate this
        # is still LAST step's target (compute_temp_target runs after the
        # press chain, fix_nh.cpp:832-838)
        kt = boltz * t_target
        omega_mass = nh["omega_mass"]  # frozen at segment setup
        em = nh["etap_kt"] / (self.p_freq_max * self.p_freq_max)

        flags = jnp.asarray([float(f) for f in self.p_flag6],
                            state.dtype)
        kecurrent = jnp.sum(flags * omega_mass
                            * omega_dot * omega_dot)
        lkt_press = kt if self.pcouple == "iso" else self.pdof * kt

        # etap_dotdot[1:] is PERSISTENT (etap_mass_flag=0: the reference
        # does not refresh it at entry — values carry over from the last
        # call's final loop / segment setup); only [0] is recomputed here
        etap_dotdot = nh["etap_dotdot"]
        etap_dotdot = etap_dotdot.at[0].set((kecurrent - lkt_press) / em)

        ncfac = 1.0 / self.nc_pchain
        for _ in range(self.nc_pchain):
            for ich in range(M - 1, 0, -1):
                expfac = jnp.exp(-ncfac * dt8 * etap_dot[ich + 1])
                ed = etap_dot[ich] * expfac
                ed = ed + etap_dotdot[ich] * ncfac * dt4
                ed = ed * self.pdrag_factor * expfac
                etap_dot = etap_dot.at[ich].set(ed)

            expfac = jnp.exp(-ncfac * dt8 * etap_dot[1])
            ed0 = etap_dot[0] * expfac
            ed0 = ed0 + etap_dotdot[0] * ncfac * dt4
            ed0 = ed0 * self.pdrag_factor * expfac
            etap_dot = etap_dot.at[0].set(ed0)

            etap = etap + ncfac * dthalf * etap_dot[:M]

            factor_etap = jnp.exp(-ncfac * dthalf * etap_dot[0])
            omega_dot = jnp.where(flags > 0, omega_dot * factor_etap,
                                  omega_dot)

            kecurrent = jnp.sum(
                flags * omega_mass * omega_dot * omega_dot
            )
            etap_dotdot = etap_dotdot.at[0].set((kecurrent - lkt_press) / em)

            ed0 = etap_dot[0] * expfac
            ed0 = ed0 + etap_dotdot[0] * ncfac * dt4
            ed0 = ed0 * expfac
            etap_dot = etap_dot.at[0].set(ed0)

            for ich in range(1, M):
                expfac = jnp.exp(-ncfac * dt8 * etap_dot[ich + 1])
                ed = etap_dot[ich] * expfac
                edd = (em * etap_dot[ich - 1] ** 2 - kt) / em
                etap_dotdot = etap_dotdot.at[ich].set(edd)
                ed = ed + edd * ncfac * dt4
                ed = ed * expfac
                etap_dot = etap_dot.at[ich].set(ed)

        aux = dict(state.aux)
        aux[AUX_KEY] = {
            **nh, "etap": etap, "etap_dot": etap_dot, "omega_dot": omega_dot,
            "etap_dotdot": etap_dotdot,
        }
        return state.replace(aux=aux)

    def _remap(self, state: State) -> State:
        """Half-step box dilation + atom rescale in lamda coords
        (ref: FixNH::remap, src/fix_nh.cpp:1068; fixedpoint = box center)."""
        dto = 0.5 * self.dt
        nh = state.aux[AUX_KEY]
        od = nh["omega_dot"]
        box = state.box

        lamda = box.to_lamda(state.x)

        if self.fixed_point is not None:
            center = jnp.asarray(self.fixed_point, state.dtype)
        else:
            center = 0.5 * (box.lo + box.hi)
        expfac = jnp.exp(dto * od[:3])
        dflags = jnp.asarray([float(f) for f in self.p_flag6[:3]],
                             state.dtype)
        expfac = jnp.where(dflags > 0, expfac, 1.0)
        new_lo = (box.lo - center) * expfac + center
        new_hi = (box.hi - center) * expfac + center
        tilt = box.tilt  # (xy, xz, yz) <-> h (5, 4, 3)
        if self.triclinic:
            # time-symmetric tilt evolution (ref: remap off-diagonal
            # halves around the diagonal scaling, fix_nh.cpp:1111-1210;
            # scalexy/z are 0 when the tilts are barostatted)
            dto2 = dto / 2.0
            dto4 = dto / 4.0
            dto8 = dto / 8.0
            f3, f4, f5 = (float(self.p_flag6[3]), float(self.p_flag6[4]),
                          float(self.p_flag6[5]))
            xy, xz, yz = tilt[0], tilt[1], tilt[2]
            prd0 = box.prd  # pre-scaling diagonal (h[0..2] at entry)

            def tilt_half(xy, xz, yz, prd_z, prd_y):
                if f4:
                    e = jnp.exp(dto8 * od[0])
                    xz = (xz * e + dto4 * (od[5] * yz + od[4] * prd_z)) * e
                if f3:
                    e = jnp.exp(dto4 * od[1])
                    yz = (yz * e + dto2 * (od[3] * prd_z)) * e
                if f5:
                    e = jnp.exp(dto4 * od[0])
                    xy = (xy * e + dto2 * (od[5] * prd_y)) * e
                if f4:
                    e = jnp.exp(dto8 * od[0])
                    xz = (xz * e + dto4 * (od[5] * yz + od[4] * prd_z)) * e
                return xy, xz, yz

            # BOTH halves use the entry diagonal: the reference reads
            # domain->h, which set_global_box() refreshes only after the
            # whole remap (fix_nh.cpp:1111-1210)
            xy, xz, yz = tilt_half(xy, xz, yz, prd0[2], prd0[1])
            xy, xz, yz = tilt_half(xy, xz, yz, prd0[2], prd0[1])
            tilt = jnp.stack([xy, xz, yz])
        new_box = dataclasses.replace(box, lo=new_lo, hi=new_hi,
                                      tilt=tilt)

        x = new_box.to_box(lamda)
        # dilate selection (ref: allremap vs dilate_group_bit,
        # fix_nh.cpp:1084-1090); NOT the fix's own group by default
        if self.dilate_all:
            dmask = state.valid_mask[:, None]
        else:
            dmask = (state.valid_mask
                     & state.group_mask(self.dilate_groupbit))[:, None]
        x = jnp.where(dmask, x, state.x)

        omega = nh["omega"] + dto * od
        aux = dict(state.aux)
        aux[AUX_KEY] = {**nh, "omega": omega}
        return state.replace(x=x, box=new_box, aux=aux)

    def barostat_energy(self, state: State) -> Array:
        """Barostat contribution to the conserved quantity
        (ref: FixNH::compute_scalar barostat block): pressure-thermostat
        chain potential+kinetic, cell kinetic energy, and the PV strain
        term p_hydro*(V - V0)/nktv2p."""
        boltz, nktv2p = self.units.boltz, self.units.nktv2p
        nh = state.aux[AUX_KEY]
        t_target = self._t_target(state)
        kt = boltz * t_target
        lkt_press = kt if self.pcouple == "iso" else self.pdim * kt
        em = nh["etap_kt"] / (self.p_freq_max * self.p_freq_max)

        if self.mpchain:
            e = lkt_press * nh["etap"][0] + 0.5 * em * nh["etap_dot"][0] ** 2
            for ich in range(1, self.mpchain):
                e = (e + kt * nh["etap"][ich]
                     + 0.5 * em * nh["etap_dot"][ich] ** 2)
        else:
            e = jnp.zeros((), state.dtype)

        omega_mass = nh["omega_mass"]  # frozen at segment setup
        flags = jnp.asarray([float(f) for f in self.p_flag6],
                            state.dtype)
        od = nh["omega_dot"]
        e = e + jnp.sum(flags * 0.5 * omega_mass * od * od)

        _, p_hydro = self._p_target(state)
        e = e + p_hydro * (state.box.volume - nh["vol0"]) / nktv2p
        return e

    # -- hooks (order per fix_nh.cpp:828-884) --------------------------------

    def initial_integrate(self, state: State) -> State:
        state = self._nhc_press_integrate(state)  # sees LAST t_target
        state = self._update_t_target(state)
        state = self._nhc_temp_integrate(state)
        state = self._nh_omega_dot(state)
        state = self._nh_v_press(state)
        state = self.nve_v(state)
        state = self._remap(state)
        state = self.nve_x(state)
        state = self._remap(state)
        return state

    def final_integrate(self, state: State) -> State:
        state = self.nve_v(state)
        state = self._nh_v_press(state)
        state = self._measure_t_cur(state)
        state = self._nh_omega_dot(state)
        state = self._nhc_temp_integrate(state)
        state = self._nhc_press_integrate(state)
        return state


@dataclasses.dataclass(frozen=True)
class FixNPH(FixNPT):
    """fix nph: barostat only — the thermostat chain is disabled
    (ref: fix_nph.cpp: tstat_flag off)."""

    tstat: bool = False

    def _nhc_temp_integrate(self, state: State) -> State:
        return state

    def _t_target(self, state: State) -> Array:
        """Barostat reference temperature: ptemp when given
        (ref: fix_nh.cpp:260-264 + setup t0 = p_temp)."""
        if self.p_temp is not None:
            return jnp.asarray(self.p_temp, state.dtype)
        return super()._t_target(state)

    def thermostat_energy(self, state: State) -> Array:
        return jnp.zeros((), state.dtype)


@dataclasses.dataclass(frozen=True)
class FixNVTSllod(FixNVT):
    """fix nvt/sllod [psllod yes|no]: NH thermostat on the THERMAL
    velocities of a deforming box (SLLOD equations of motion;
    ref: src/fix_nvt_sllod.cpp nh_v_temp + compute_temp_deform bias).
    Requires a fix deform installing aux["h_rate"]."""

    psllod: bool = False

    def _bias(self, state: State):
        """Streaming velocity u(x) = h_rate lamda + h_ratelo
        (ref: ComputeTempDeform::remove_bias)."""
        hr = state.aux.get("h_rate")
        if hr is None:
            return jnp.zeros_like(state.v)
        lam = state.box.to_lamda(state.x)
        ux = hr[0] * lam[:, 0] + hr[5] * lam[:, 1] + hr[4] * lam[:, 2]
        uy = hr[1] * lam[:, 1] + hr[3] * lam[:, 2]
        uz = hr[2] * lam[:, 2]
        return jnp.stack([ux, uy, uz], axis=-1)

    def _t_current(self, state: State) -> Array:
        g = state.valid_mask & state.group_mask(self.tbit)
        m = jnp.where(g, state.per_atom_mass, 0.0)
        vt = state.v - self._bias(state)
        ke = jnp.sum(m * jnp.sum(vt * vt, axis=-1))
        return self.units.mvv2e * ke / (
            jnp.maximum(self._tdof(state), 1.0) * self.units.boltz)

    def _apply_v_scale(self, state: State, scale) -> State:
        """nh_v_temp with the SLLOD vdelu correction
        (ref: fix_nvt_sllod.cpp:100-135). h_two = h_rate h_inv
        (upper-triangular product)."""
        hr = state.aux.get("h_rate")
        dthalf = 0.5 * self.dt
        gmask = self._gmask(state)
        bias = self._bias(state)
        if hr is None:
            v = jnp.where(gmask, state.v * scale, state.v)
            return state.replace(v=v)
        hinv = state.box.h_inv
        # Voigt: (0,1,2)=diag, 3=yz, 4=xz, 5=xy; multiply_shape_shape
        h_two = jnp.stack([
            hr[0] * hinv[0, 0],
            hr[1] * hinv[1, 1],
            hr[2] * hinv[2, 2],
            hr[1] * hinv[1, 2] + hr[3] * hinv[2, 2],
            hr[0] * hinv[0, 2] + hr[5] * hinv[1, 2] + hr[4] * hinv[2, 2],
            hr[0] * hinv[0, 1] + hr[5] * hinv[1, 1],
        ])
        v = state.v
        if not self.psllod:
            v = v - bias
        vdelu = jnp.stack([
            h_two[0] * v[:, 0] + h_two[5] * v[:, 1] + h_two[4] * v[:, 2],
            h_two[1] * v[:, 1] + h_two[3] * v[:, 2],
            h_two[2] * v[:, 2],
        ], axis=-1)
        if self.psllod:
            v = v - bias
        vnew = v * scale - dthalf * vdelu + bias
        v = jnp.where(gmask, vnew, state.v)
        return state.replace(v=v)
