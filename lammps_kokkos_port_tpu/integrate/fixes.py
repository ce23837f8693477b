"""Auxiliary (non-integrating) fixes: langevin, setforce, momentum, etc.

TPU-native equivalents of the reference's core fix inventory
(ref: SURVEY.md §2.9 "other core fixes"; src/fix_langevin.cpp,
src/fix_setforce.cpp, src/fix_momentum.cpp, src/fix_enforce2d.cpp,
src/fix_viscous.cpp, src/fix_spring.cpp, src/fix_recenter.cpp,
src/fix_addforce.cpp). Each is a frozen dataclass of compile-time params;
hooks are pure state transforms composed into the jitted step
(ref: Modify's per-hook call lists, src/modify.cpp:389-469).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.state import State
from ..utils.units import Units
from .verlet import AuxFix

Array = jax.Array


def _gmask(state: State, groupbit: int) -> Array:
    return (state.valid_mask & state.group_mask(groupbit))[:, None]


@dataclasses.dataclass(frozen=True)
class FixLangevin(AuxFix):
    """fix langevin: stochastic thermostat in post_force
    (ref: src/fix_langevin.cpp:428-658, SURVEY.md §A.11).

    f += gamma1*v + gamma2*(u-0.5), gamma1 = -m/t_period/ftm2v,
    gamma2 = sqrt(24 kB T m / (t_period dt)) / ftm2v (uniform noise).

    RNG: counter-based jax.random keyed on (seed, ntimestep) — statistically
    equivalent to the reference's per-rank RanMars stream but decomposition-
    invariant by construction (the reference achieves that only for
    `velocity create loop geom`).
    """

    t_start: float = 1.0
    t_stop: float = 1.0
    t_period: float = 1.0
    seed: int = 12345
    dt: float = 0.005
    units: Units = None
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        u = self.units
        m = state.per_atom_mass[:, None]
        # constant target (ramps use the nh_run window if installed)
        if "nh_run" in state.aux:
            run = state.aux["nh_run"]
            begin = run[0].astype(state.dtype)
            span = jnp.maximum(run[1].astype(state.dtype) - begin, 1.0)
            delta = jnp.clip(
                (state.ntimestep.astype(state.dtype) - begin) / span, 0.0, 1.0
            )
        else:
            delta = jnp.zeros((), state.dtype)
        t_target = self.t_start + delta * (self.t_stop - self.t_start)

        gamma1 = -m / self.t_period / u.ftm2v
        gamma2 = (
            jnp.sqrt(24.0 * u.boltz * t_target * m / (self.t_period * self.dt))
            / u.ftm2v
        )
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed), state.ntimestep
        )
        noise = jax.random.uniform(key, state.v.shape, state.dtype) - 0.5
        df = gamma1 * state.v + gamma2 * noise
        f = state.f + jnp.where(_gmask(state, self.groupbit), df, 0.0)
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixSetForce(AuxFix):
    """fix setforce: pin force components; None = leave untouched
    (ref: src/fix_setforce.cpp)."""

    fx: object = None
    fy: object = None
    fz: object = None
    groupbit: int = 1
    region: object | None = None

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        if self.region is not None:
            g = g & self.region.match(state.x)
        f = state.f
        for d, val in enumerate((self.fx, self.fy, self.fz)):
            val = _fix_value(val, state)
            if val is not None:
                f = f.at[:, d].set(jnp.where(g, val, f[:, d]))
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixAddForce(AuxFix):
    """fix addforce: constant extra force (ref: src/fix_addforce.cpp)."""

    fx: object = 0.0
    fy: object = 0.0
    fz: object = 0.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        comps = [_fix_value(c, state) for c in (self.fx, self.fy, self.fz)]
        add = jnp.stack([jnp.broadcast_to(
            jnp.asarray(c, state.dtype), state.f.shape[:1])
            for c in comps], axis=-1)
        f = state.f + jnp.where(_gmask(state, self.groupbit), add, 0.0)
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixGravity(AuxFix):
    """fix gravity `vector` style: f += m g vhat
    (ref: src/fix_gravity.cpp — used by the SPH water-collapse deck)."""

    g: float = 9.81
    vx: float = 0.0
    vy: float = 0.0
    vz: float = -1.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        v = jnp.asarray([self.vx, self.vy, self.vz], state.dtype)
        vhat = v / jnp.sqrt(jnp.sum(v * v))
        add = (self.g * state.per_atom_mass)[:, None] * vhat[None, :]
        f = state.f + jnp.where(_gmask(state, self.groupbit), add, 0.0)
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixFreeze(AuxFix):
    """fix freeze: zero force AND torque on the group each step; the group
    is also excluded from time integration by not appearing in any
    integrator fix (ref: src/GRANULAR/fix_freeze.cpp post_force)."""

    groupbit: int = 1

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)
        f = jnp.where(g, 0.0, state.f)
        state = state.replace(f=f)
        if "torque" in state.aux:
            tq = jnp.where(g, 0.0, state.aux["torque"])
            state = state.replace(aux={**state.aux, "torque": tq})
        return state


@dataclasses.dataclass(frozen=True)
class FixViscous(AuxFix):
    """fix viscous: f -= gamma*v drag (ref: src/fix_viscous.cpp)."""

    gamma: float = 1.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        f = state.f - jnp.where(
            _gmask(state, self.groupbit), self.gamma * state.v, 0.0
        )
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixMomentum(AuxFix):
    """fix momentum: zero the group's linear momentum every N steps
    (ref: src/fix_momentum.cpp; `linear 1 1 1` semantics)."""

    every: int = 1
    groupbit: int = 1
    linear: tuple = (True, True, True)

    def end_of_step(self, state: State) -> State:
        def zero(v):
            g = _gmask(state, self.groupbit)
            m = state.per_atom_mass[:, None]
            mg = jnp.where(g, m, 0.0)
            mtot = jnp.maximum(jnp.sum(mg), 1e-300)
            vcm = jnp.sum(mg * v, axis=0) / mtot
            sel = jnp.asarray([float(s) for s in self.linear], state.dtype)
            return v - jnp.where(g, (vcm * sel)[None, :], 0.0)

        do = jnp.mod(state.ntimestep, self.every) == 0
        v = jax.lax.cond(do, zero, lambda v: v, state.v)
        return state.replace(v=v)


@dataclasses.dataclass(frozen=True)
class FixEnforce2D(AuxFix):
    """fix enforce2d: zero z force/velocity each step
    (ref: src/fix_enforce2d.cpp)."""

    groupbit: int = 1

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        f = state.f.at[:, 2].set(jnp.where(g, 0.0, state.f[:, 2]))
        v = state.v.at[:, 2].set(jnp.where(g, 0.0, state.v[:, 2]))
        return state.replace(f=f, v=v)


@dataclasses.dataclass(frozen=True)
class FixSpring(AuxFix):
    """fix spring tether K x y z R0: harmonic pull of the group's COM
    toward a point, engaging beyond rest length R0; NULL components (None
    in x0) are excluded from the displacement
    (ref: src/fix_spring.cpp spring_tether: unwrapped group xcm)."""

    k: float = 1.0
    x0: tuple = (0.0, 0.0, 0.0)  # entries may be None (NULL)
    r0: float = 0.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)
        m = state.per_atom_mass[:, None]
        mg = jnp.where(g, m, 0.0)
        mtot = jnp.maximum(jnp.sum(mg), 1e-300)
        prd = state.box.prd.astype(state.dtype)
        xu = state.x + state.image.astype(state.dtype) * prd
        com = jnp.sum(mg * xu, axis=0) / mtot
        sel = jnp.asarray([0.0 if c is None else 1.0 for c in self.x0],
                          state.dtype)
        pt = jnp.asarray([0.0 if c is None else float(c) for c in self.x0],
                         state.dtype)
        dr = (com - pt) * sel
        r = jnp.maximum(jnp.sqrt(jnp.sum(dr * dr)), 1e-10)
        fmag = self.k * (r - self.r0) / r  # k dr/r (ref :177-186)
        fadd = -fmag * dr[None, :] * (mg / mtot)
        return state.replace(f=state.f + fadd)


@dataclasses.dataclass(frozen=True)
class FixRecenter(AuxFix):
    """fix recenter: shift group so its COM stays at the initial point
    (ref: src/fix_recenter.cpp, INIT mode)."""

    groupbit: int = 1
    aux_key: str = "recenter_com0"

    def setup(self, state: State) -> State:
        g = _gmask(state, self.groupbit)
        m = state.per_atom_mass[:, None]
        mg = jnp.where(g, m, 0.0)
        mtot = jnp.maximum(jnp.sum(mg), 1e-300)
        com = jnp.sum(mg * state.x, axis=0) / mtot
        return state.replace(aux={**state.aux, self.aux_key: com})

    def end_of_step(self, state: State) -> State:
        g = _gmask(state, self.groupbit)
        m = state.per_atom_mass[:, None]
        mg = jnp.where(g, m, 0.0)
        mtot = jnp.maximum(jnp.sum(mg), 1e-300)
        com = jnp.sum(mg * state.x, axis=0) / mtot
        shift = state.aux[self.aux_key] - com
        x = state.x + jnp.where(g, shift[None, :], 0.0)
        return state.replace(x=x)


@dataclasses.dataclass(frozen=True)
class FixAveForce(AuxFix):
    """fix aveforce: replace each non-None component with the group
    average plus the given constant (ref: src/fix_aveforce.cpp)."""

    fx: object = None
    fy: object = None
    fz: object = None
    groupbit: int = 1
    region: object | None = None

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        if self.region is not None:
            g = g & self.region.match(state.x)
        n = jnp.maximum(jnp.sum(g), 1)
        f = state.f
        for d, val in enumerate((self.fx, self.fy, self.fz)):
            val = _fix_value(val, state)
            if val is not None:
                avg = jnp.sum(jnp.where(g, f[:, d], 0.0)) / n
                f = f.at[:, d].set(jnp.where(g, avg + val, f[:, d]))
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixSpringSelf(AuxFix):
    """fix spring/self: per-atom tether to the setup position
    (ref: src/fix_spring_self.cpp; unwrapped coordinates)."""

    k: float = 1.0
    groupbit: int = 1
    aux_key: str = "springself_x0"

    def _unwrap(self, state: State) -> Array:
        prd = state.box.prd.astype(state.dtype)
        return state.x + state.image.astype(state.dtype) * prd

    def setup(self, state: State) -> State:
        return state.replace(
            aux={**state.aux, self.aux_key: self._unwrap(state)})

    def post_force(self, state: State) -> State:
        dx = self._unwrap(state) - state.aux[self.aux_key]
        f = state.f - jnp.where(_gmask(state, self.groupbit),
                                self.k * dx, 0.0)
        return state.replace(f=f)


def _group_temp(state: State, groupbit: int, units: Units):
    """Group-scoped compute temp: T = sum m v^2 mvv2e / (dof kB),
    dof = dim*N - dim (ref: src/compute_temp.cpp dof_compute)."""
    g = _gmask(state, groupbit)[:, 0]
    m = jnp.where(g, state.per_atom_mass, 0.0)
    ke = jnp.sum(m * jnp.sum(state.v * state.v, axis=-1))
    dim = 3 if state.dimension == 3 else 2
    dof = dim * jnp.sum(g) - dim
    return units.mvv2e * ke / (jnp.maximum(dof, 1) * units.boltz)


def _run_delta(state: State):
    """(step - beginstep)/(endstep - beginstep) ramp fraction using the
    run window installed in aux (ref: update->beginstep/endstep)."""
    if "nh_run" in state.aux:
        run = state.aux["nh_run"]
        begin = run[0].astype(state.dtype)
        span = jnp.maximum(run[1].astype(state.dtype) - begin, 1.0)
        return jnp.clip(
            (state.ntimestep.astype(state.dtype) - begin) / span, 0.0, 1.0)
    return jnp.zeros((), state.dtype)


@dataclasses.dataclass(frozen=True)
class FixTempRescale(AuxFix):
    """fix temp/rescale N t_start t_stop window fraction: every N steps,
    if |T - target| > window rescale group velocities by
    sqrt(T'/T), T' = T - fraction (T - target)
    (ref: src/fix_temp_rescale.cpp end_of_step)."""

    every: int = 1
    t_start: float = 1.0
    t_stop: float = 1.0
    window: float = 0.0
    fraction: float = 1.0
    units: Units = None
    groupbit: int = 1

    def end_of_step(self, state: State) -> State:
        t_cur = _group_temp(state, self.groupbit, self.units)
        t_target = self.t_start + _run_delta(state) * (self.t_stop
                                                       - self.t_start)
        tp = t_cur - self.fraction * (t_cur - t_target)
        factor = jnp.sqrt(tp / jnp.maximum(t_cur, 1e-300))
        do = jnp.logical_and(
            jnp.mod(state.ntimestep, self.every) == 0,
            jnp.abs(t_cur - t_target) > self.window,
        )
        factor = jnp.where(do, factor, 1.0)
        v = jnp.where(_gmask(state, self.groupbit), state.v * factor,
                      state.v)
        return state.replace(v=v)


@dataclasses.dataclass(frozen=True)
class FixTempBerendsen(AuxFix):
    """fix temp/berendsen t_start t_stop t_period: every step rescale by
    lamda = sqrt(1 + dt/t_period (target/T - 1))
    (ref: src/fix_temp_berendsen.cpp end_of_step)."""

    t_start: float = 1.0
    t_stop: float = 1.0
    t_period: float = 1.0
    dt: float = 0.005
    units: Units = None
    groupbit: int = 1

    def end_of_step(self, state: State) -> State:
        t_cur = _group_temp(state, self.groupbit, self.units)
        t_target = self.t_start + _run_delta(state) * (self.t_stop
                                                       - self.t_start)
        lam = jnp.sqrt(1.0 + self.dt / self.t_period
                       * (t_target / jnp.maximum(t_cur, 1e-300) - 1.0))
        v = jnp.where(_gmask(state, self.groupbit), state.v * lam, state.v)
        return state.replace(v=v)


@dataclasses.dataclass(frozen=True)
class FixTempCSVR(AuxFix):
    """fix temp/csvr t_start t_stop t_period seed: Bussi-Donadio-Parrinello
    canonical-sampling velocity rescale, stream-exact vs the reference
    (ref: src/EXTRA-FIX/fix_temp_csvr.cpp end_of_step/resamplekin; the
    RanMars draws — gaussian + gamma-deviate rejection chains — replay
    inside jit via utils/ranmars lax.while_loops)."""

    t_start: float = 1.0
    t_stop: float = 1.0
    t_period: float = 1.0
    seed: int = 12345
    dof: int = 0  # group DOF (dim*N - dim), static for the gamdev branch
    dt: float = 0.005
    units: Units = None
    groupbit: int = 1

    @property
    def aux_key(self) -> str:
        return f"csvr_rng_{self.seed}"

    def setup(self, state: State) -> State:
        if self.aux_key in state.aux:
            return state
        from ..utils.ranmars import ranmars_init

        return state.replace(
            aux={**state.aux, self.aux_key: ranmars_init(self.seed)})

    def end_of_step(self, state: State) -> State:
        from ..utils import ranmars as rm

        if self.dof < 1:
            return state
        u = self.units
        rs = state.aux[self.aux_key]
        t_cur = _group_temp(state, self.groupbit, self.units)
        t_target = self.t_start + _run_delta(state) * (self.t_stop
                                                       - self.t_start)
        efactor = 0.5 * self.dof * u.boltz
        ekin_old = t_cur * efactor
        ekin_new = t_target * efactor
        # resamplekin (fix_temp_csvr.cpp:304-313)
        c1 = jnp.exp(jnp.asarray(-self.dt / self.t_period, jnp.float64))
        c2 = (1.0 - c1) * ekin_new / ekin_old / self.dof
        r1, rs = rm.gaussian(rs)
        r2, rs = rm.sumnoises(rs, self.dof - 1)
        scale = c1 + c2 * (r1 * r1 + r2) + 2.0 * r1 * jnp.sqrt(c1 * c2)
        lamda = jnp.sqrt(scale).astype(state.dtype)
        v = jnp.where(_gmask(state, self.groupbit), state.v * lamda, state.v)
        return state.replace(v=v, aux={**state.aux, self.aux_key: rs})


@dataclasses.dataclass(frozen=True)
class FixTempCSLD(AuxFix):
    """fix temp/csld: canonical-sampling Langevin-dynamics thermostat —
    per-atom mix of old velocities with fresh gaussian ones, stream-exact
    (ref: src/EXTRA-FIX/fix_temp_csld.cpp end_of_step; Bussi & Parrinello,
    Phys Rev E 75, 056707 (2007))."""

    t_start: float = 1.0
    t_stop: float = 1.0
    t_period: float = 1.0
    seed: int = 12345
    dof: int = 0
    dt: float = 0.005
    units: Units = None
    groupbit: int = 1

    # per-atom draws must replay in the reference's local atom order —
    # the spatial-bin sort refreshed by the script at every run setup
    # (utils/localorder.py; ref: src/verlet.cpp:123, src/atom.cpp:2246)
    needs_local_order = True

    @property
    def aux_key(self) -> str:
        return f"csld_rng_{self.seed}"

    def setup(self, state: State) -> State:
        if self.aux_key in state.aux:
            return state
        from ..utils.ranmars import ranmars_init

        aux = {**state.aux, self.aux_key: ranmars_init(self.seed)}
        rank_key = self.aux_key + "_rank"
        if rank_key not in aux:
            # identity fallback (tag order); the script overwrites with
            # the reference bin-sorted order before each run
            n = int(state.tag.shape[0])
            aux[rank_key] = jnp.arange(n + 1, dtype=jnp.int32)
        return state.replace(aux=aux)

    def end_of_step(self, state: State) -> State:
        from jax import lax

        from ..utils import ranmars as rm

        if self.dof < 1:
            return state
        rs = state.aux[self.aux_key]
        t_target = self.t_start + _run_delta(state) * (self.t_stop
                                                       - self.t_start)
        g = _gmask(state, self.groupbit)[:, 0]
        minv = (1.0 / jnp.sqrt(jnp.maximum(
            state.per_atom_mass, 1e-300))).astype(jnp.float64)

        # the reference consumes gaussians in LOCAL INDEX order = the
        # data-file line order on one rank (NOT tag order — fourmol's
        # Atoms section is unsorted); our storage order changes at
        # rebuilds, so scan in that recorded order
        rank_key = self.aux_key + "_rank"
        if rank_key in state.aux:
            rank = state.aux[rank_key][state.tag]
        else:
            rank = state.tag
        key = jnp.where(g, rank, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(key)

        def body(rs, inp):
            gi, mi = inp

            def draw(rs):
                a, rs = rm.gaussian(rs)
                b, rs = rm.gaussian(rs)
                c, rs = rm.gaussian(rs)
                return rs, jnp.stack([a, b, c])

            rs, gv = lax.cond(
                gi, draw, lambda r: (r, jnp.zeros(3, jnp.float64)), rs)
            return rs, gv * mi

        rs, vrand_o = lax.scan(body, rs, (g[order], minv[order]))
        vrand = jnp.zeros_like(vrand_o).at[order].set(vrand_o)
        vrand = vrand.astype(state.dtype)
        # c2 uses the temperature of the RANDOMIZED group velocities
        # (fix_temp_csld.cpp:222-225 calls compute_scalar after the swap)
        vmix = jnp.where(g[:, None], vrand, state.v)
        t_rand = _group_temp(state.replace(v=vmix), self.groupbit,
                             self.units)
        c1 = jnp.exp(jnp.asarray(-self.dt / self.t_period,
                                 state.dtype))
        c2 = jnp.sqrt((1.0 - c1 * c1) * t_target
                      / jnp.maximum(t_rand, 1e-300))
        v = jnp.where(g[:, None], state.v * c1 + vrand * c2, state.v)
        return state.replace(v=v, aux={**state.aux, self.aux_key: rs})


@dataclasses.dataclass(frozen=True)
class FixPlaneForce(AuxFix):
    """fix planeforce: project force onto the plane normal to n
    (ref: src/fix_planeforce.cpp)."""

    nx: float = 0.0
    ny: float = 0.0
    nz: float = 1.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        n = jnp.asarray([self.nx, self.ny, self.nz], state.dtype)
        n = n / jnp.sqrt(jnp.sum(n * n))
        dot = state.f @ n
        f = state.f - jnp.where(_gmask(state, self.groupbit),
                                dot[:, None] * n[None, :], 0.0)
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixLineForce(AuxFix):
    """fix lineforce: keep only the force component along n
    (ref: src/fix_lineforce.cpp)."""

    nx: float = 0.0
    ny: float = 0.0
    nz: float = 1.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        n = jnp.asarray([self.nx, self.ny, self.nz], state.dtype)
        n = n / jnp.sqrt(jnp.sum(n * n))
        dot = state.f @ n
        proj = dot[:, None] * n[None, :]
        f = jnp.where(_gmask(state, self.groupbit), proj, state.f)
        return state.replace(f=f)


_WALL_FACES = {"xlo": (0, -1), "xhi": (0, +1), "ylo": (1, -1),
               "yhi": (1, +1), "zlo": (2, -1), "zhi": (2, +1)}


@dataclasses.dataclass(frozen=True)
class FixWall(AuxFix):
    """fix wall/{lj93,lj126,lj1043,harmonic,morse}: flat-wall potentials
    (ref: src/fix_wall.cpp geometry + per-style precompute/wall_particle in
    src/fix_wall_lj93.cpp etc.). walls: tuple of
    (face, coord|None for EDGE, eps, sigma[, alpha], cutoff); style names
    follow the reference. Forces only (wall energy is a scalar output the
    thermo table does not consume here)."""

    style: str = "lj93"
    walls: tuple = ()
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        f = state.f
        g = _gmask(state, self.groupbit)[:, 0]
        lo = state.box.lo
        hi = state.box.hi
        for w in self.walls:
            face, coord, eps, sig, alpha, cutoff = w
            dim, side = _WALL_FACES[face]
            c = jnp.where(
                jnp.isnan(jnp.asarray(coord, state.dtype)),
                jnp.where(side < 0, lo[dim], hi[dim]),
                jnp.asarray(coord, state.dtype),
            )
            delta = jnp.where(side < 0, state.x[:, dim] - c,
                              c - state.x[:, dim])
            inside = jnp.logical_and(g, jnp.logical_and(delta > 0.0,
                                                        delta < cutoff))
            d = jnp.where(inside, delta, 1.0)
            rinv = 1.0 / d
            if self.style == "lj93":
                c1 = 6.0 / 5.0 * eps * sig ** 9
                c2 = 3.0 * eps * sig ** 3
                fwall = c1 * rinv ** 10 - c2 * rinv ** 4
            elif self.style == "lj126":
                c1 = 48.0 * eps * sig ** 12
                c2 = 24.0 * eps * sig ** 6
                fwall = rinv ** 6 * (c1 * rinv ** 6 - c2) * rinv
            elif self.style == "lj1043":
                tp = 2.0 * jnp.pi
                c1 = tp * 2.0 / 5.0 * eps * sig ** 10
                c2 = tp * eps * sig ** 4
                c3 = tp * (2.0 ** 0.5) / 3.0 * eps * sig ** 3
                c4 = 0.61 / (2.0 ** 0.5) * sig
                fwall = (10.0 * c1 * rinv ** 11 - 4.0 * c2 * rinv ** 5
                         - 3.0 * c3 * (d + c4) ** -4)
            elif self.style == "harmonic":
                fwall = 2.0 * eps * (cutoff - d)
            elif self.style == "morse":
                dexp = jnp.exp(-alpha * (d - sig))
                fwall = 2.0 * eps * alpha * (dexp * dexp - dexp)
            else:
                raise ValueError(self.style)
            df = jnp.where(inside, -float(side) * fwall, 0.0)
            f = f.at[:, dim].add(df)
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixWallLepton(AuxFix):
    """fix wall/lepton: flat walls with a runtime-compiled algebraic
    potential E(r[,rc]); force from autodiff where the reference
    differentiates symbolically (ref: src/LEPTON/fix_wall_lepton.cpp
    wall_particle: f[dim] += side * dE/dr(delta), E shifted by E(rc)).
    walls: tuple of (dim, side, coord, cutoff, expr)."""

    walls: tuple = ()
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        import jax

        from ..utils.lepton import lepton_fn

        f = state.f
        g = _gmask(state, self.groupbit)[:, 0]
        for dim, side, coord, cutoff, expr in self.walls:
            e_fn = lepton_fn(expr)

            def e_of_r(r):
                return e_fn(r=r, rc=jnp.asarray(cutoff, state.dtype))

            delta = jnp.where(side < 0, state.x[:, dim] - coord,
                              coord - state.x[:, dim])
            inside = g & (delta > 0.0) & (delta < cutoff)
            d = jnp.where(inside, delta, 0.5 * cutoff)
            fw = float(side) * jax.vmap(jax.grad(e_of_r))(d)
            f = f.at[:, dim].add(jnp.where(inside, fw, 0.0))
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixMomentumFull(AuxFix):
    """fix momentum with linear + angular + rescale options
    (ref: src/fix_momentum.cpp end_of_step: vcm subtraction, omega = I^-1 L
    about the unwrapped COM, KE-preserving rescale)."""

    every: int = 1
    groupbit: int = 1
    linear: tuple | None = (True, True, True)
    angular: bool = False
    rescale: bool = False

    def end_of_step(self, state: State) -> State:
        def apply(v):
            g = _gmask(state, self.groupbit)
            m = state.per_atom_mass[:, None]
            mg = jnp.where(g, m, 0.0)
            mtot = jnp.maximum(jnp.sum(mg), 1e-300)
            ke_old = jnp.sum(mg * v * v)
            if self.linear is not None:
                vcm = jnp.sum(mg * v, axis=0) / mtot
                sel = jnp.asarray([float(s) for s in self.linear],
                                  state.dtype)
                v = v - jnp.where(g, (vcm * sel)[None, :], 0.0)
            if self.angular:
                prd = state.box.prd.astype(state.dtype)
                xu = state.x + state.image.astype(state.dtype) * prd
                xcm = jnp.sum(mg * xu, axis=0) / mtot
                r = xu - xcm
                L = jnp.sum(mg * jnp.cross(r, v), axis=0)
                r2 = jnp.sum(r * r, axis=-1)
                eye = jnp.eye(3, dtype=state.dtype)
                inertia = jnp.sum(
                    mg[:, :, None]
                    * (r2[:, None, None] * eye
                       - r[:, :, None] * r[:, None, :]), axis=0)
                omega = jnp.linalg.solve(
                    inertia + 1e-300 * eye, L)
                v = v - jnp.where(g, jnp.cross(
                    jnp.broadcast_to(omega, r.shape), r), 0.0)
            if self.rescale:
                ke_new = jnp.maximum(jnp.sum(mg * v * v), 1e-300)
                factor = jnp.sqrt(ke_old / ke_new)
                v = jnp.where(g, v * factor, v)
            return v

        do = jnp.mod(state.ntimestep, self.every) == 0
        v = jax.lax.cond(do, apply, lambda v: v, state.v)
        return state.replace(v=v)


def _com(state: State, groupbit: int):
    """Unwrapped COM + total mass of a group (ref: Group::xcm)."""
    g = _gmask(state, groupbit)
    m = state.per_atom_mass[:, None]
    mg = jnp.where(g, m, 0.0)
    mtot = jnp.maximum(jnp.sum(mg), 1e-300)
    prd = state.box.prd.astype(state.dtype)
    xu = state.x + state.image.astype(state.dtype) * prd
    com = jnp.sum(mg * xu, axis=0) / mtot
    return com, mtot, mg, xu


@dataclasses.dataclass(frozen=True)
class FixEfield(AuxFix):
    """fix efield Ex Ey Ez: f += qE (components pre-multiplied by qe2f
    at build; ref: src/fix_efield.cpp:60-75 + post_force qflag branch).
    Optional region scoping (keyword `region`)."""

    ex: object = 0.0
    ey: object = 0.0
    ez: object = 0.0
    groupbit: int = 1
    region: object | None = None

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)
        if self.region is not None:
            g = g & self.region.match(state.x)[:, None]
        comps = [_fix_value(c, state) for c in (self.ex, self.ey, self.ez)]
        e = jnp.stack([jnp.broadcast_to(jnp.asarray(c, state.dtype),
                                        state.q.shape)
                       for c in comps], axis=-1)
        add = state.q[:, None] * e
        return state.replace(f=state.f + jnp.where(g, add, 0.0))


@dataclasses.dataclass(frozen=True)
class FixEfieldTIP4P(AuxFix):
    """fix efield/tip4p Ex Ey Ez: qE with each water's M-site share
    redistributed onto real sites — (1-alpha) to O, alpha/2 per H (ref:
    src/EXTRA-FIX/fix_efield_tip4p.cpp post_force:92-118; alpha from the
    pair style's qdist + equilibrium geometry, :72-76). The weights are
    static, so the per-atom force is qeff*E with qeff precomputed on
    host and installed in aux."""

    ex: object = 0.0
    ey: object = 0.0
    ez: object = 0.0
    alpha: float = 0.0
    groupbit: int = 1
    osrc: object = None  # np [cap] int: owning-O index for water H, else i

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def setup(self, state: State) -> State:
        if "eft_osrc" in state.aux:
            return state
        return state.replace(aux={
            **state.aux, "eft_osrc": jnp.asarray(self.osrc, jnp.int32)})

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)
        comps = [_fix_value(c, state) for c in (self.ex, self.ey, self.ez)]
        e = jnp.stack([jnp.broadcast_to(jnp.asarray(c, state.dtype),
                                        state.q.shape)
                       for c in comps], axis=-1)
        qe = state.q[:, None] * e
        osrc = state.aux["eft_osrc"]
        idx = jnp.arange(osrc.shape[0])
        is_h = osrc != idx
        is_o = jnp.zeros_like(is_h).at[osrc].set(is_h, mode="drop")
        add = (qe - self.alpha * jnp.where(is_o[:, None], qe, 0.0)
               + 0.5 * self.alpha * jnp.where(is_h[:, None], qe[osrc], 0.0))
        return state.replace(f=state.f + jnp.where(g, add, 0.0))


@dataclasses.dataclass(frozen=True)
class FixDrag(AuxFix):
    """fix drag x y z fmag delta: constant-magnitude force pulling each
    group atom toward the (min-imaged) point when farther than delta
    (ref: src/EXTRA-FIX/fix_drag.cpp post_force)."""

    pt: tuple = (0.0, 0.0, 0.0)  # entries None = NULL (dim excluded)
    fmag: float = 0.0
    delta: float = 0.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        sel = jnp.asarray([0.0 if c is None else 1.0 for c in self.pt],
                          state.dtype)
        pt = jnp.asarray([0.0 if c is None else float(c) for c in self.pt],
                         state.dtype)
        d = state.box.min_image((state.x - pt[None, :]) * sel[None, :])
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        on = g & (r > self.delta)
        pref = self.fmag / jnp.maximum(r, 1e-300)
        fadd = jnp.where(on[:, None], -pref[:, None] * d, 0.0)
        return state.replace(f=state.f + fadd.astype(state.dtype))


@dataclasses.dataclass(frozen=True)
class FixOneway(AuxFix):
    """fix oneway N region -x|+x|...: every N steps, flip the offending
    velocity component of group atoms inside the region
    (ref: src/EXTRA-FIX/fix_oneway.cpp end_of_step)."""

    nevery: int = 1
    region: object | None = None
    dim: int = 0
    minus: bool = False
    groupbit: int = 1

    def end_of_step(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        if self.region is not None:
            g = g & self.region.match(state.x)
        g = g & (state.ntimestep % self.nevery == 0)
        vd = state.v[:, self.dim]
        bad = (vd > 0.0) if self.minus else (vd < 0.0)
        v = state.v.at[:, self.dim].set(jnp.where(g & bad, -vd, vd))
        return state.replace(v=v)


@dataclasses.dataclass(frozen=True)
class FixHeat(AuxFix):
    """fix heat N flux [region]: every N steps add/subtract kinetic
    energy via a momentum-conserving velocity rescale
    (ref: src/fix_heat.cpp end_of_step, CONSTANT branch)."""

    nevery: int = 1
    flux: float = 0.0
    ftm2v: float = 1.0
    region: object | None = None
    groupbit: int = 1

    def end_of_step(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        if self.region is not None:
            g = g & self.region.match(state.x)
        m = jnp.where(g, state.per_atom_mass, 0.0)
        mtot = jnp.maximum(jnp.sum(m), 1e-300)
        vcm = jnp.sum(m[:, None] * state.v, axis=0) / mtot
        ke = 0.5 * jnp.sum(m * jnp.sum(state.v * state.v, axis=-1))
        vcmsq = jnp.sum(vcm * vcm)
        heat = self.flux * self.nevery * self.dt * self.ftm2v
        denom = ke - 0.5 * vcmsq * mtot
        escale = (denom + heat) / denom
        scale = jnp.sqrt(jnp.maximum(escale, 0.0))
        vsub = (scale - 1.0) * vcm
        fire = (state.ntimestep % self.nevery == 0)
        vnew = scale * state.v - vsub[None, :]
        v = jnp.where((g & fire)[:, None], vnew, state.v)
        return state.replace(v=v)

    dt: float = 0.005


@dataclasses.dataclass(frozen=True)
class FixSpringCouple(AuxFix):
    """fix spring couple group2 K x y z R0: spring between two groups'
    COMs; mass-weighted equal/opposite forces
    (ref: src/fix_spring.cpp spring_couple)."""

    k: float = 1.0
    group2bit: int = 1
    x0: tuple = (0.0, 0.0, 0.0)  # None entries = NULL
    r0: float = 0.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        com1, mtot1, mg1, _ = _com(state, self.groupbit)
        com2, mtot2, mg2, _ = _com(state, self.group2bit)
        sel = jnp.asarray([0.0 if c is None else 1.0 for c in self.x0],
                          state.dtype)
        pt = jnp.asarray([0.0 if c is None else float(c) for c in self.x0],
                         state.dtype)
        d = (com2 - com1 - pt) * sel
        r = jnp.maximum(jnp.sqrt(jnp.sum(d * d)), 1e-10)
        fv = self.k * d * (r - self.r0) / r  # [3]
        fadd = (fv[None, :] * (mg1 / mtot1)
                - fv[None, :] * (mg2 / mtot2))
        return state.replace(f=state.f + fadd)


@dataclasses.dataclass(frozen=True)
class FixSpringRG(AuxFix):
    """fix spring/rg K RG0: radius-of-gyration restraint; RG0=NULL
    captures the initial Rg at setup (ref: src/EXTRA-FIX/
    fix_spring_rg.cpp). f_i -= 2K(1 - rg0/rg)(xu_i - com) m_i/M."""

    k: float = 1.0
    rg0: float | None = None  # None = NULL -> captured at setup
    groupbit: int = 1
    aux_key: str = "spring_rg0"

    def _rg(self, state: State):
        com, mtot, mg, xu = _com(state, self.groupbit)
        d = xu - com[None, :]
        rg2 = jnp.sum(mg[:, 0] * jnp.sum(d * d, axis=-1)) / mtot
        return jnp.sqrt(rg2), com, mtot, mg, d

    def setup(self, state: State) -> State:
        rg, *_ = self._rg(state)
        val = rg if self.rg0 is None else jnp.asarray(self.rg0, state.dtype)
        return state.replace(aux={**state.aux, self.aux_key: val})

    def post_force(self, state: State) -> State:
        rg, com, mtot, mg, d = self._rg(state)
        rg0 = state.aux[self.aux_key]
        term1 = 2.0 * self.k * (1.0 - rg0 / rg)
        fadd = -term1 * d * (mg / mtot)
        return state.replace(f=state.f + fadd)


@dataclasses.dataclass(frozen=True)
class FixSMD(AuxFix):
    """fix smd cvel|cfor ... tether|couple ...: steered MD — constant
    velocity (spring anchor moving at v along the initial direction) or
    constant force on the group COM (ref: src/EXTRA-FIX/fix_smd.cpp).
    r_old (the moving anchor length) persists in state.aux."""

    cvel: bool = False
    k: float = 0.0       # k_smd (cvel)
    v: float = 0.0       # v_smd (cvel)
    fmag: float = 0.0    # f_smd (cfor)
    couple: bool = False
    group2bit: int = 1
    pt: tuple = (0.0, 0.0, 0.0)  # None=NULL, "auto"=renormalized (couple)
    r0: float = 0.0
    dt: float = 0.005
    groupbit: int = 1
    aux_key: str = "smd_state"

    def _dir0(self, state: State):
        """Initial spring geometry (ref: FixSMD::init)."""
        com, _, _, _ = _com(state, self.groupbit)
        pt = [0.0 if c in (None, "auto") else float(c) for c in self.pt]
        sel = jnp.asarray([0.0 if c is None else 1.0 for c in self.pt],
                          state.dtype)
        if self.couple:
            com2, _, _, _ = _com(state, self.group2bit)
            auto = jnp.asarray([1.0 if c == "auto" else 0.0
                                for c in self.pt], state.dtype)
            d = (auto * (com2 - com)
                 + (1.0 - auto) * jnp.asarray(pt, state.dtype)) * sel
        else:
            d = (jnp.asarray(pt, state.dtype) - com) * sel
        r = jnp.sqrt(jnp.sum(d * d))
        n = jnp.where(r > 1e-10, d / jnp.maximum(r, 1e-300), 0.0)
        return r, n

    def setup(self, state: State) -> State:
        r_old, n = self._dir0(state)
        return state.replace(aux={**state.aux, self.aux_key: {
            "r_old": r_old, "n": n}})

    def setup_post_force(self, state: State) -> State:
        """Each run's setup re-runs FixSMD::init — the anchor length
        r_old and direction reset from the CURRENT geometry (constants
        for non-auto couple dims) — then applies post_force like
        FixSMD::setup."""
        state = self.setup(state)
        return self.post_force(state)

    def post_force(self, state: State) -> State:
        sm = state.aux[self.aux_key]
        r_old, n = sm["r_old"], sm["n"]
        sel = jnp.asarray([0.0 if c is None else 1.0 for c in self.pt],
                          state.dtype)
        com1, mtot1, mg1, _ = _com(state, self.groupbit)
        if self.couple:
            com2, mtot2, mg2, _ = _com(state, self.group2bit)
            auto = jnp.asarray([1.0 if c == "auto" else 0.0
                                for c in self.pt], state.dtype)
            # renormalize direction (ref: smd_couple head)
            d = (auto * (com2 - com1) + (1.0 - auto) * n * r_old) * sel
            r = jnp.sqrt(jnp.sum(d * d))
            n = jnp.where(r > 1e-10, d / jnp.maximum(r, 1e-300), n)
            if self.cvel:
                d = com2 - com1 - n * r_old
                d = d * sel
                r = jnp.sqrt(jnp.sum(d * d))
                dr = r - self.r0
                fv = jnp.where(r > 1e-10,
                               self.k * d * dr / jnp.maximum(r, 1e-300),
                               0.0)
            else:
                d = (com2 - com1) * sel
                r = jnp.maximum(jnp.sqrt(jnp.sum(d * d)), 1e-300)
                fv = self.fmag * d / r
                r_old = r
            fadd = (fv[None, :] * (mg1 / mtot1)
                    - fv[None, :] * (mg2 / mtot2))
        else:
            pt = jnp.asarray([0.0 if c in (None, "auto") else float(c)
                              for c in self.pt], state.dtype)
            d_full = com1 - pt
            d = d_full * sel
            r = jnp.sqrt(jnp.sum(d * d))
            if self.cvel:
                dr = r - self.r0 - r_old
                fv = jnp.where(r > 1e-10,
                               self.k * d * dr / jnp.maximum(r, 1e-300),
                               0.0)
            else:
                r_old = r
                fv = self.fmag * d / jnp.maximum(r, 1e-300)
            fadd = -fv[None, :] * (mg1 / mtot1)
        if self.cvel:
            r_old = r_old + self.v * self.dt
        aux = {**state.aux, self.aux_key: {"r_old": r_old, "n": n}}
        return state.replace(f=state.f + fadd, aux=aux)


@dataclasses.dataclass(frozen=True)
class FixPressBerendsen(AuxFix):
    """fix press/berendsen iso P0 P1 Pdamp [modulus K]: weak-coupling
    barostat — end-of-step isotropic rescale of box + ALL atoms by
    dilation = (1 - dt/Pdamp (Ptarget - P)/bulkmodulus)^(1/3); pressure
    sensed globally (its computes are created on group all,
    fix_press_berendsen.cpp:225-233, end_of_step :339-360, remap :401)."""

    p_start: float = 0.0
    p_stop: float = 0.0
    p_period: float = 1.0
    bulkmodulus: float = 10.0
    units_obj: object = None
    dt: float = 0.005
    groupbit: int = 1
    needs_virial: bool = True

    def end_of_step(self, state: State) -> State:
        import dataclasses as _dc

        from ..compute import thermo as thermo_mod

        u = self.units_obj
        p = thermo_mod.pressure(state, state.virial, u)
        run = state.aux.get("nh_run")
        if run is not None:
            delta = jnp.clip(
                (state.ntimestep.astype(state.dtype)
                 - run[0].astype(state.dtype)) /
                jnp.maximum((run[1] - run[0]).astype(state.dtype), 1.0),
                0.0, 1.0)
        else:
            delta = 0.0
        p_tgt = self.p_start + delta * (self.p_stop - self.p_start)
        mu = (1.0 - self.dt / self.p_period
              * (p_tgt - p) / self.bulkmodulus) ** (1.0 / 3.0)
        box = state.box
        center = 0.5 * (box.lo + box.hi)
        lam = box.to_lamda(state.x)
        new_lo = (box.lo - center) * mu + center
        new_hi = (box.hi - center) * mu + center
        nb = _dc.replace(box, lo=new_lo, hi=new_hi)
        x = nb.to_box(lam)
        x = jnp.where(state.valid_mask[:, None], x, state.x)
        return state.replace(x=x, box=nb)


@dataclasses.dataclass(frozen=True)
class FixDeform(AuxFix):
    """fix deform N <dim style args ...> [remap x|none]: ramp the box
    between per-run start values and style-derived stop values, remapping
    group atoms in lamda coords (ref: src/fix_deform.cpp end_of_step
    :652, stop-value setup :440-470; orthogonal dims, styles
    final/delta/scale/vel/erate)."""

    nevery: int = 1
    # per-dim: (style, a, b) — style None = untouched
    dims: tuple = ((None, 0.0, 0.0),) * 3
    # tilt ramps in box order (xy, xz, yz); styles final/delta/erate
    tilts: tuple = ((None, 0.0, 0.0),) * 3
    remap: bool = True
    remap_v: bool = False  # remap v: Lees-Edwards velocity shifts at wrap
    dt: float = 0.005
    groupbit: int = 1
    aux_key: str = "deform_start"

    def setup(self, state: State) -> State:
        # box at fix creation (ref: lo_initial, fix_deform.cpp:333)
        snap = jnp.stack([state.box.lo, state.box.hi, state.box.tilt])
        return state.replace(aux={
            **state.aux,
            self.aux_key + "_init": snap,
            self.aux_key: snap})

    def refresh_segment(self, state: State) -> State:
        # start box per run: current box when the run window begins at
        # this step, else the fix-creation box (multi-run start/stop
        # windows; ref: fix_deform.cpp:430-438)
        run = state.aux["nh_run"]
        at_begin = state.ntimestep == run[0]
        cur = jnp.stack([state.box.lo, state.box.hi, state.box.tilt])
        init = state.aux[self.aux_key + "_init"]
        start = jnp.where(at_begin, cur, init)
        state = state.replace(aux={**state.aux, self.aux_key: start})
        # h_rate for temp/deform bias + Lees-Edwards velocity wrap
        # (ref: FixDeform::init sets domain->h_rate, h Voigt order
        # x,y,z,yz,xz,xy)
        nsteps = jnp.maximum(run[1].astype(state.dtype)
                             - run[0].astype(state.dtype), 1.0)
        delt = nsteps * self.dt
        stops, tilt_s = self._tilt_stops(state, nsteps)
        hr = jnp.zeros(6, state.dtype)
        hr = hr.at[5].set((stops[0] - tilt_s[0]) / delt)  # xy
        hr = hr.at[4].set((stops[1] - tilt_s[1]) / delt)  # xz
        hr = hr.at[3].set((stops[2] - tilt_s[2]) / delt)  # yz
        # diagonal rates from lo/hi stops
        st0 = state.aux[self.aux_key]
        lo1, hi1 = self._targets(state, jnp.asarray(1.0, state.dtype),
                                 nsteps)
        for d, (style, a, b) in enumerate(self.dims):
            if style is None:
                continue
            hr = hr.at[d].set(((hi1[d] - st0[1, d])
                               - (lo1[d] - st0[0, d])) / delt)
        aux = {**state.aux, "h_rate": hr}
        if self.remap_v:
            aux["deform_vremap"] = jnp.asarray(1, jnp.int32)
        return state.replace(aux=aux)

    def _targets(self, state: State, delta, nsteps):
        st = state.aux[self.aux_key]
        lo_s, hi_s = st[0], st[1]
        lo_t, hi_t = [], []
        for d, (style, a, b) in enumerate(self.dims):
            lo0, hi0 = lo_s[d], hi_s[d]
            if style is None:
                lo_t.append(state.box.lo[d])
                hi_t.append(state.box.hi[d])
                continue
            mid = 0.5 * (lo0 + hi0)
            L0 = hi0 - lo0
            if style == "final":
                lo1, hi1 = a, b
            elif style == "delta":
                lo1, hi1 = lo0 + a, hi0 + b
            elif style == "scale":
                lo1 = mid - 0.5 * a * L0
                hi1 = mid + 0.5 * a * L0
            elif style == "vel":
                lo1 = lo0 - 0.5 * nsteps * self.dt * a
                hi1 = hi0 + 0.5 * nsteps * self.dt * a
            elif style == "erate":
                lo1 = lo0 - 0.5 * nsteps * self.dt * a * L0
                hi1 = hi0 + 0.5 * nsteps * self.dt * a * L0
            else:
                raise ValueError(style)
            lo_t.append(lo0 + delta * (lo1 - lo0))
            hi_t.append(hi0 + delta * (hi1 - hi0))
        return jnp.stack(lo_t), jnp.stack(hi_t)

    def _tilt_stops(self, state: State, nsteps):
        """Per-run tilt targets (ref: fix_deform.cpp:447-470 erate uses
        the perpendicular dim's start length)."""
        st = state.aux[self.aux_key]
        tilt_s = st[2]
        L = st[1] - st[0]
        perp = (1, 2, 2)  # xy->y, xz->z, yz->z
        stops = []
        for d, (style, a, b) in enumerate(self.tilts):
            t0 = tilt_s[d]
            if style is None:
                stops.append(t0)
            elif style == "final":
                stops.append(jnp.asarray(a, state.dtype))
            elif style == "delta":
                stops.append(t0 + a)
            elif style == "erate":
                stops.append(t0 + nsteps * self.dt * a * L[perp[d]])
            else:
                raise ValueError(style)
        return jnp.stack(stops), tilt_s

    def _tilt_targets(self, state: State, delta, nsteps):
        stops, tilt_s = self._tilt_stops(state, nsteps)
        out = []
        for d, (style, _, _) in enumerate(self.tilts):
            if style is None:
                out.append(state.box.tilt[d])
            else:
                out.append(tilt_s[d] + delta * (stops[d] - tilt_s[d]))
        return jnp.stack(out)

    def end_of_step(self, state: State) -> State:
        import dataclasses as _dc

        run = state.aux["nh_run"]
        begin = run[0].astype(state.dtype)
        nsteps = jnp.maximum(run[1].astype(state.dtype) - begin, 1.0)
        delta = jnp.clip(
            (state.ntimestep.astype(state.dtype) - begin) / nsteps,
            0.0, 1.0)
        lo_t, hi_t = self._targets(state, delta, nsteps)
        tl_t = self._tilt_targets(state, delta, nsteps)
        fire = (state.ntimestep % self.nevery) == 0
        lo_t = jnp.where(fire, lo_t, state.box.lo)
        hi_t = jnp.where(fire, hi_t, state.box.hi)
        tl_t = jnp.where(fire, tl_t, state.box.tilt)
        box = state.box
        nb = _dc.replace(box, lo=lo_t, hi=hi_t, tilt=tl_t)
        if self.remap:
            lam = box.to_lamda(state.x)
            x = nb.to_box(lam)
            g = _gmask(state, self.groupbit)
            x = jnp.where(g, x, state.x)
            state = state.replace(x=x)
        return state.replace(box=nb)


@dataclasses.dataclass(frozen=True)
class FixRestrain(AuxFix):
    """fix restrain bond|lbound|angle|dihedral ...: per-tuple harmonic
    restraints with run-ramped K (and deq for bonds), forces via exact
    gradients of the reference energies (ref: src/fix_restrain.cpp
    restrain_bond :250, restrain_lbound :321 (one-sided), restrain_angle
    :401, restrain_dihedral :518 with multiplicity + target phase)."""

    # tuples of local atom indices + params, all static
    bonds: tuple = ()      # (i, j, k0, k1, d0, d1, lbound: bool)
    angles: tuple = ()     # (i, j, k, k0, k1, theta0_rad)
    dihedrals: tuple = ()  # (i, j, k, l, k0, k1, target_rad, mult)
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        run = state.aux["nh_run"]
        begin = run[0].astype(state.dtype)
        span = jnp.maximum(run[1].astype(state.dtype) - begin, 1.0)
        delta = jnp.clip(
            (state.ntimestep.astype(state.dtype) - begin) / span, 0.0, 1.0)

        def energy(x):
            e = jnp.zeros((), state.dtype)
            for (i, j, k0, k1, d0, d1, lb) in self.bonds:
                kk = k0 + delta * (k1 - k0)
                deq = d0 + delta * (d1 - d0)
                d = state.box.min_image(x[i] - x[j])
                r = jnp.sqrt(jnp.sum(d * d))
                dr = r - deq
                term = kk * dr * dr
                if lb:
                    term = jnp.where(dr < 0, term, 0.0)
                e = e + term
            for (i, j, k, k0, k1, th0) in self.angles:
                kk = k0 + delta * (k1 - k0)
                d1v = state.box.min_image(x[i] - x[j])
                d2v = state.box.min_image(x[k] - x[j])
                c = jnp.sum(d1v * d2v) / jnp.sqrt(
                    jnp.sum(d1v * d1v) * jnp.sum(d2v * d2v))
                th = jnp.arccos(jnp.clip(c, -1.0, 1.0))
                e = e + kk * (th - th0) ** 2
            for (i, j, k, l, k0, k1, tgt, mult) in self.dihedrals:
                kk = k0 + delta * (k1 - k0)
                from ..models.bonded import _dihedral_phi

                vb1 = state.box.min_image(x[i] - x[j])
                vb2 = state.box.min_image(x[k] - x[j])
                vb3 = state.box.min_image(x[l] - x[k])
                phi = _dihedral_phi(vb1, vb2, vb3)
                e = e + kk * (1.0 + jnp.cos(mult * phi - tgt))
            return e

        g = jax.grad(energy)(state.x)
        return state.replace(f=state.f - g)


def _unwrap_x(state: State) -> Array:
    prd = state.box.prd.astype(state.dtype)
    return state.x + state.image.astype(state.dtype) * prd


def _omega_of(angmom, inertia):
    """Solve I w = L via the exact 3x3 inverse (ref: Group::omega
    nonsingular branch; chunks here are molecules, never singular to
    EPSILON after the determinant guard)."""
    det = jnp.linalg.det(inertia)
    safe = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
    w = jnp.linalg.solve(
        jnp.where(jnp.abs(det) > 1e-300, inertia, jnp.eye(3)), angmom)
    return jnp.where(jnp.abs(det) > 1e-300, w, 0.0)


@dataclasses.dataclass(frozen=True)
class FixAddTorque(AuxFix):
    """fix addtorque Tx Ty Tz: apply forces producing a net torque on the
    group about its COM while cancelling the torque the group's own
    rotation would produce (ref: src/EXTRA-FIX/fix_addtorque.cpp
    post_force)."""

    tx: object = 0.0
    ty: object = 0.0
    tz: object = 0.0
    mvv2e: float = 1.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        m = jnp.where(g, state.per_atom_mass, 0.0)
        mtot = jnp.maximum(jnp.sum(m), 1e-300)
        xu = _unwrap_x(state)
        xcm = jnp.sum(m[:, None] * xu, axis=0) / mtot
        d = xu - xcm[None, :]
        # group inertia tensor + angular momentum (ref: Group::inertia/
        # angmom)
        dd = jnp.sum(d * d, axis=-1)
        eye = jnp.eye(3, dtype=state.dtype)
        inertia = jnp.einsum("i,iab->ab", m,
                             dd[:, None, None] * eye[None]
                             - d[:, :, None] * d[:, None, :])
        L = jnp.sum(m[:, None] * jnp.cross(d, state.v), axis=0)
        omega = _omega_of(L, inertia)

        odotr = jnp.sum(omega[None, :] * d, axis=-1)
        # ref: tlocal = m omegadotr (dy wz - dz wy, ...)
        itq = jnp.sum((m * odotr)[:, None]
                      * jnp.stack([d[:, 1] * omega[2] - d[:, 2] * omega[1],
                                   d[:, 2] * omega[0] - d[:, 0] * omega[2],
                                   d[:, 0] * omega[1] - d[:, 1] * omega[0]],
                                  axis=-1), axis=0)
        tvals = [_fix_value(c, state) for c in (self.tx, self.ty, self.tz)]
        tcm = (jnp.stack([jnp.asarray(c, state.dtype) for c in tvals])
               - self.mvv2e * itq)
        domegadt = _omega_of(tcm, inertia)
        vrot = self.mvv2e * jnp.stack(
            [d[:, 2] * omega[1] - d[:, 1] * omega[2],
             d[:, 0] * omega[2] - d[:, 2] * omega[0],
             d[:, 1] * omega[0] - d[:, 0] * omega[1]], axis=-1)
        fadd = m[:, None] * jnp.stack(
            [d[:, 2] * domegadt[1] - d[:, 1] * domegadt[2]
             + vrot[:, 2] * omega[1] - vrot[:, 1] * omega[2],
             d[:, 0] * domegadt[2] - d[:, 2] * domegadt[0]
             + vrot[:, 0] * omega[2] - vrot[:, 2] * omega[0],
             d[:, 1] * domegadt[0] - d[:, 0] * domegadt[1]
             + vrot[:, 1] * omega[0] - vrot[:, 0] * omega[1]], axis=-1)
        f = state.f + jnp.where(g[:, None], fadd, 0.0)
        return state.replace(f=f)


def _chunk_sums(vals, chunk, nchunk):
    """Segment-sum vals [cap,...] into [nchunk,...]; chunk<0 = none."""
    ok = chunk >= 0
    idx = jnp.where(ok, chunk, 0)
    z = jnp.zeros((nchunk,) + vals.shape[1:], vals.dtype)
    vals = jnp.where(ok.reshape((-1,) + (1,) * (vals.ndim - 1)), vals, 0.0)
    return z.at[idx].add(vals, mode="drop")


@dataclasses.dataclass(frozen=True)
class FixMomentumChunk(AuxFix):
    """fix momentum/chunk N chunkID linear x y z [angular] [rescale]:
    zero each chunk's linear/angular momentum every N steps, optionally
    rescaling to preserve per-chunk kinetic energy
    (ref: src/EXTRA-FIX/fix_momentum_chunk.cpp end_of_step; chunks =
    molecule IDs)."""

    nevery: int = 1
    nchunk: int = 0
    linear: tuple = (True, True, True)
    angular: bool = False
    rescale: bool = False
    groupbit: int = 1

    def end_of_step(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        chunk = jnp.where(g, state.molecule - 1, -1)
        nc = self.nchunk
        m = jnp.where(g, state.per_atom_mass, 0.0)
        mc = jnp.maximum(_chunk_sums(m, chunk, nc), 1e-300)
        v = state.v
        ke_old = _chunk_sums(m * jnp.sum(v * v, axis=-1), chunk, nc)

        idx = jnp.where(chunk >= 0, chunk, 0)
        # com/vcm/omega are all computed from the PRE-adjustment
        # velocities (the reference's three computes run before any
        # adjustment, fix_momentum_chunk.cpp end_of_step head)
        vcm = _chunk_sums(m[:, None] * v, chunk, nc) / mc[:, None]
        xu = _unwrap_x(state)
        com = (_chunk_sums(m[:, None] * xu, chunk, nc) / mc[:, None])
        d = xu - com[idx]
        dd = jnp.sum(d * d, axis=-1)
        eye = jnp.eye(3, dtype=state.dtype)
        iner = _chunk_sums(
            m[:, None, None] * (dd[:, None, None] * eye[None]
                                - d[:, :, None] * d[:, None, :]),
            chunk, nc)
        L = _chunk_sums(m[:, None] * jnp.cross(d, v), chunk, nc)
        omega = jax.vmap(_omega_of)(L, iner)
        if any(self.linear):
            sel = jnp.asarray([float(s) for s in self.linear], state.dtype)
            v = v - jnp.where((chunk >= 0)[:, None],
                              vcm[idx] * sel[None, :], 0.0)
        if self.angular:
            om = omega[idx]
            v = v - jnp.where((chunk >= 0)[:, None],
                              jnp.cross(om, d), 0.0)
        if self.rescale:
            ke_new = _chunk_sums(m * jnp.sum(v * v, axis=-1), chunk, nc)
            # NOTE: the reference's guard tests ke_chunk_new[0] — chunk 0,
            # not m (fix_momentum_chunk.cpp:265); when chunk 0 is outside
            # the fix group the whole rescale is a no-op. Transcribed
            # verbatim for trajectory parity.
            factor = jnp.where(ke_new[0] > 0.0,
                               jnp.sqrt(ke_old
                                        / jnp.maximum(ke_new, 1e-300)),
                               1.0)
            v = jnp.where((chunk >= 0)[:, None], v * factor[idx][:, None],
                          v)
        fire = (state.ntimestep % self.nevery) == 0
        v = jnp.where(fire, v, state.v)
        return state.replace(v=v)


@dataclasses.dataclass(frozen=True)
class FixSpringChunk(AuxFix):
    """fix spring/chunk K chunkID comID: tether each chunk's COM to its
    position at the first force evaluation; the applied per-COM force is
    k * d/|d| mass-weighted over the chunk (ref: src/fix_spring_chunk.cpp
    post_force — the reference applies this constant-magnitude form)."""

    k: float = 1.0
    nchunk: int = 0
    groupbit: int = 1
    aux_key: str = "spring_chunk_com0"

    def _coms(self, state: State):
        # the chunk + com computes run on group ALL, and the restoring
        # force applies to EVERY chunked atom regardless of the fix
        # group (ref: fix_spring_chunk.cpp apply loop has no group test)
        g = state.valid_mask
        chunk = jnp.where(g, state.molecule - 1, -1)
        m = jnp.where(g, state.per_atom_mass, 0.0)
        mc = jnp.maximum(_chunk_sums(m, chunk, self.nchunk), 1e-300)
        xu = _unwrap_x(state)
        com = _chunk_sums(m[:, None] * xu, chunk, self.nchunk) / mc[:, None]
        return chunk, m, mc, com

    def setup_post_force(self, state: State) -> State:
        if self.aux_key not in state.aux:
            _, _, _, com = self._coms(state)
            state = state.replace(aux={**state.aux, self.aux_key: com})
        return self.post_force(state)

    def post_force(self, state: State) -> State:
        chunk, m, mc, com = self._coms(state)
        com0 = state.aux[self.aux_key]
        d = com - com0
        r = jnp.maximum(jnp.sqrt(jnp.sum(d * d, axis=-1)), 1e-10)
        fcom = self.k * d / r[:, None] / mc[:, None]
        idx = jnp.where(chunk >= 0, chunk, 0)
        fadd = -m[:, None] * fcom[idx]
        f = state.f + jnp.where((chunk >= 0)[:, None], fadd, 0.0)
        return state.replace(f=f)


def _fix_value(spec, state: State):
    """Resolve a fix component: None | float | ('equal', fn, scale) |
    ('atom', aux_key, col, scale). Returns None, a scalar, or [cap]."""
    if spec is None or isinstance(spec, float):
        return spec
    kind = spec[0]
    if kind == "equal":
        step = state.ntimestep.astype(state.dtype)
        run = state.aux.get("nh_run")
        if run is not None:
            begin = run[0].astype(state.dtype)
            span = jnp.maximum(run[1].astype(state.dtype) - begin, 1.0)
            delta = jnp.clip((step - begin) / span, 0.0, 1.0)
            elapsed = (step - begin) * (spec[3] if len(spec) > 3 else 0.0)
        else:
            delta = elapsed = 0.0
        return spec[1](step, delta, elapsed) * spec[2]
    if kind == "atom":
        return state.aux[spec[1]][:, spec[2]] * spec[3]
    raise ValueError(spec)


@dataclasses.dataclass(frozen=True)
class FixStoreState(AuxFix):
    """fix ID group store/state N keys...: capture per-atom quantities
    (N=0: once at setup) for later variable references f_ID[col]
    (ref: src/fix_store_state.cpp)."""

    fid: str = "store"
    keys: tuple = ("x", "y", "z")
    groupbit: int = 1

    def setup(self, state: State) -> State:
        cols = []
        xu = _unwrap_x(state)
        for k in self.keys:
            if k in ("x", "y", "z"):
                cols.append(state.x[:, "xyz".index(k)])
            elif k in ("xu", "yu", "zu"):
                cols.append(xu[:, "xyz".index(k[0])])
            elif k in ("vx", "vy", "vz"):
                cols.append(state.v[:, "xyz".index(k[1])])
            elif k in ("fx", "fy", "fz"):
                cols.append(state.f[:, "xyz".index(k[1])])
        arr = jnp.stack(cols, axis=-1)
        return state.replace(aux={**state.aux,
                                  f"store_{self.fid}": arr})


def _run_delta(state: State):
    run = state.aux.get("nh_run")
    if run is None:
        return jnp.zeros((), state.dtype)
    begin = run[0].astype(state.dtype)
    span = jnp.maximum(run[1].astype(state.dtype) - begin, 1.0)
    return jnp.clip(
        (state.ntimestep.astype(state.dtype) - begin) / span, 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class FixAdapt(AuxFix):
    """fix adapt N pair <style> epsilon|scale * * v_var [kspace v_var]
    [scale no]: per-step uniform parameter adaptation. Supported scope:
    uniform epsilon (force-linear styles like lj/cut) or the coul `scale`
    attribute — either reduces to one multiplicative factor on the pair
    (and optionally kspace) contribution, applied pre-force each nevery
    steps (ref: src/fix_adapt.cpp change_settings :543, called from
    setup_pre_force/pre_force)."""

    fn: object = None       # compiled equal expression
    base: float = 1.0       # divisor (epsilon0 for epsilon adapts)
    nevery: int = 1
    kspace: bool = False
    groupbit: int = 1

    def _scale(self, state: State):
        val = self.fn(state.ntimestep.astype(state.dtype),
                      _run_delta(state))
        return val / self.base

    def setup(self, state: State) -> State:
        aux = dict(state.aux)
        aux["adapt_pair_scale"] = jnp.ones((), state.dtype)
        if self.kspace:
            aux["adapt_kspace_scale"] = jnp.ones((), state.dtype)
        return state.replace(aux=aux)

    def setup_post_force(self, state: State) -> State:
        # ref: FixAdapt::setup_pre_force runs change_settings before the
        # run's first force pass; our runner applies it right after via
        # presetup — update the scale so the NEXT pass (step 1) sees it
        return self.initial_integrate(state)

    def initial_integrate(self, state: State) -> State:
        fire = (state.ntimestep % self.nevery) == 0
        s = jnp.where(fire, self._scale(state),
                      state.aux["adapt_pair_scale"])
        aux = {**state.aux, "adapt_pair_scale": s}
        if self.kspace:
            aux["adapt_kspace_scale"] = s
        return state.replace(aux=aux)


def _nr_spline(x, y, yp1, ypn):
    """Numerical-Recipes cubic spline second derivatives with specified
    end slopes (ref: FixWallTable::spline — transcribed for table
    parity)."""
    import numpy as np

    n = len(x)
    y2 = np.zeros(n)
    u = np.zeros(n)
    big = 0.99e30
    if yp1 > big:
        y2[0] = u[0] = 0.0
    else:
        y2[0] = -0.5
        u[0] = (3.0 / (x[1] - x[0])) * ((y[1] - y[0]) / (x[1] - x[0]) - yp1)
    for i in range(1, n - 1):
        sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1])
        p = sig * y2[i - 1] + 2.0
        y2[i] = (sig - 1.0) / p
        ui = ((y[i + 1] - y[i]) / (x[i + 1] - x[i])
              - (y[i] - y[i - 1]) / (x[i] - x[i - 1]))
        u[i] = (6.0 * ui / (x[i + 1] - x[i - 1]) - sig * u[i - 1]) / p
    if ypn > big:
        qn = un = 0.0
    else:
        qn = 0.5
        un = (3.0 / (x[n - 1] - x[n - 2])) \
            * (ypn - (y[n - 1] - y[n - 2]) / (x[n - 1] - x[n - 2]))
    y2[n - 1] = (un - qn * u[n - 2]) / (qn * y2[n - 2] + 1.0)
    for k in range(n - 2, -1, -1):
        y2[k] = y2[k] * y2[k + 1] + u[k]
    return y2


def _nr_splint(xa, ya, y2a, xq):
    import numpy as np

    khi = np.searchsorted(xa, xq)
    khi = np.clip(khi, 1, len(xa) - 1)
    klo = khi - 1
    h = xa[khi] - xa[klo]
    a = (xa[khi] - xq) / h
    b = (xq - xa[klo]) / h
    return (a * ya[klo] + b * ya[khi]
            + ((a ** 3 - a) * y2a[klo] + (b ** 3 - b) * y2a[khi])
            * (h * h) / 6.0)


def build_wall_table(fname: str, section: str, tablength: int,
                     cutoff: float):
    """Host-side table build (ref: FixWallTable::read_table,
    spline_table, compute_table). Returns dict of numpy arrays +
    the energy offset at the cutoff."""
    import numpy as np

    rows = []
    fplo = fphi = None
    with open(fname) as fh:
        lines = fh.readlines()
    i = 0
    while i < len(lines):
        if lines[i].strip() == section:
            j = i + 1
            toks = lines[j].split()
            # N <n> [FP lo hi]
            n_in = int(toks[1])
            if "FP" in toks:
                k = toks.index("FP")
                fplo, fphi = float(toks[k + 1]), float(toks[k + 2])
            j += 1
            while len(rows) < n_in:
                t = lines[j].split()
                if len(t) >= 4:
                    rows.append((float(t[1]), float(t[2]), float(t[3])))
                j += 1
            break
        i += 1
    if not rows:
        raise ValueError(f"section {section} not found in {fname}")
    rf = np.array([r[0] for r in rows])
    ef = np.array([r[1] for r in rows])
    ff = np.array([r[2] for r in rows])
    if fplo is None:
        fplo = (ff[1] - ff[0]) / (rf[1] - rf[0])
        fphi = (ff[-1] - ff[-2]) / (rf[-1] - rf[-2])
    e2f = _nr_spline(rf, ef, -ff[0], -ff[-1])
    f2f = _nr_spline(rf, ff, fplo, fphi)

    lo, hi = rf[0], rf[-1]
    tlm1 = tablength - 1
    delta = (hi - lo) / tlm1
    r = lo + np.arange(tablength) * delta
    e = _nr_splint(rf, ef, e2f, r)
    fv = _nr_splint(rf, ff, f2f, r)
    de = np.zeros(tablength)
    df = np.zeros(tablength)
    de[:tlm1] = e[1:] - e[:tlm1]
    df[:tlm1] = fv[1:] - fv[:tlm1]
    de[tlm1] = 2.0 * de[tlm1 - 1] - de[tlm1 - 2]
    df[tlm1] = 2.0 * df[tlm1 - 1] - df[tlm1 - 2]
    e2 = _nr_spline(r, e, -fv[0], -fv[tlm1])
    f2 = _nr_spline(r, fv, fplo, fphi)
    # offset: LINEAR lookup at the cutoff (ref: setup comment — spline
    # would index out of bounds at the outer edge)
    it = min(int((cutoff - lo) / delta), tablength - 1)
    frac = (cutoff - r[it]) / delta
    offset = e[it] + frac * de[it]
    return dict(lo=lo, delta=delta, r=r, e=e, de=de, f=fv, df=df,
                e2=e2, f2=f2, offset=float(offset),
                deltasq6=delta * delta / 6.0)


@dataclasses.dataclass(frozen=True)
class FixWallTable(AuxFix):
    """fix wall/table linear|spline N <face> <coord> <file> <section>
    <cutoff> ...: tabulated wall potential (ref: src/fix_wall_table.cpp
    wall_particle + uf_lookup). Tables live in aux (installed at setup
    from the host-built arrays)."""

    # per-wall static descriptors: (dim, sideflag(-1 lo|+1 hi), coord,
    # cutoff); table arrays keyed "walltab_<fid>_<i>"
    fid: str = "w"
    walls: tuple = ()
    spline: bool = False
    tables: tuple = ()   # tuple of dicts (host numpy) — hashable? no:
    groupbit: int = 1

    def __hash__(self):  # tables hold numpy arrays; identity is fine
        return id(self)

    def __eq__(self, other):
        return self is other

    def setup(self, state: State) -> State:
        aux = dict(state.aux)
        for i, tb in enumerate(self.tables):
            aux[f"walltab_{self.fid}_{i}"] = jnp.stack([
                jnp.asarray(tb[k], state.dtype)
                for k in ("r", "e", "de", "f", "df", "e2", "f2")])
        return state.replace(aux=aux)

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        f = state.f
        for i, (dim, side, coord, cutoff) in enumerate(self.walls):
            tb = self.tables[i]
            arrs = state.aux[f"walltab_{self.fid}_{i}"]
            r_t, e_t, de_t, f_t, df_t, e2_t, f2_t = (arrs[k]
                                                     for k in range(7))
            xd = state.x[:, dim]
            delta = (xd - coord) if side < 0 else (coord - xd)
            act = g & (delta < cutoff) & (delta > 0.0)
            invd = 1.0 / tb["delta"]
            it = jnp.clip(((delta - tb["lo"]) * invd).astype(jnp.int32),
                          0, len(tb["r"]) - 1)
            frac = (delta - r_t[it]) * invd
            if not self.spline:
                mdu = f_t[it] + frac * df_t[it]
            else:
                b = frac
                a = 1.0 - b
                mdu = (a * f_t[it] + b * f_t[it + 1]
                       + ((a ** 3 - a) * f2_t[it]
                          + (b ** 3 - b) * f2_t[jnp.minimum(
                              it + 1, len(tb["r"]) - 1)])
                       * tb["deltasq6"])
            fwall = side * mdu
            f = f.at[:, dim].add(jnp.where(act, -fwall, 0.0))
        return state.replace(f=f)


@dataclasses.dataclass(frozen=True)
class FixWallRegion(AuxFix):
    """fix wall/region <region> harmonic eps sigma cutoff for BLOCK
    regions: each of the 6 faces within the cutoff contributes
    fwall = 2 eps (cutoff - r) along the inward normal
    (ref: src/fix_wall_region.cpp post_force + harmonic; block contacts
    from RegBlock::surface_interior)."""

    lo: tuple = (0.0, 0.0, 0.0)
    hi: tuple = (1.0, 1.0, 1.0)
    epsilon: float = 0.0
    sigma: float = 1.0
    cutoff: float = 0.0
    groupbit: int = 1

    def post_force(self, state: State) -> State:
        g = _gmask(state, self.groupbit)[:, 0]
        f = state.f
        for d in range(3):
            for side, face in ((1.0, self.lo[d]), (-1.0, self.hi[d])):
                r = side * (state.x[:, d] - face)
                act = g & (r < self.cutoff) & (r > 0.0)
                dr = self.cutoff - r
                fw = 2.0 * self.epsilon * dr
                f = f.at[:, d].add(jnp.where(act, side * fw, 0.0))
        return state.replace(f=f)
