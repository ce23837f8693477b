"""Simulation driver: the `run` command / library-API analog.

Mirrors the reference's Run::command -> Verlet::setup -> Verlet::run flow
(ref: src/run.cpp:37, src/verlet.cpp:93,229) with the TPU-native structure:
the hot loop is a jitted lax.scan segment; the host only orchestrates
segment boundaries (thermo output) and the neighbor-capacity
overflow-retry loop (the XLA analog of the Kokkos grow-and-rerun idiom,
ref: src/KOKKOS/npair_kokkos.cpp:225-330).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .compute import thermo as thermo_mod
from .core.state import State
from .integrate.verlet import Integrator, make_step
from .models import pair as pair_mod
from .ops import neighbor as nbr
from .utils.units import Units, get_units


class Simulation:
    """Owns state + styles + the compiled step; the `class LAMMPS` analog
    scoped to one run configuration (ref: src/lammps.h:24-109 for the role,
    src/library.cpp for the API surface this mirrors)."""

    def __init__(
        self,
        state: State,
        pair_style,
        dt: float | None = None,
        integrator: Integrator | None = None,
        fixes: tuple = (),
        skin: float | None = None,
        neigh_every: int = 1,
        neigh_delay: int = 0,
        neigh_check: bool = True,
        extra_dof: int | None = None,
        list_mode: str = "auto",
        respa=None,
    ):
        self._list_mode_req = list_mode
        self.respa = respa  # RespaLevels | None (run_style respa)
        self.state = state
        from .models.forcefield import ForceField, from_pair

        if isinstance(pair_style, ForceField):
            self.forcefield = pair_style
        else:
            self.forcefield = from_pair(pair_style)
        self.pair_style = self.forcefield.pair
        self.units: Units = get_units(state.units_name)
        self.dt = float(dt) if dt is not None else self.units.dt
        self.skin = float(skin) if skin is not None else self.units.skin
        self.neigh_every = neigh_every
        self.neigh_delay = neigh_delay
        self.neigh_check = neigh_check
        self.extra_dof = extra_dof
        if integrator is None:
            integrator = Integrator(dt=self.dt, units=self.units)
        self.fixes = tuple(fixes)
        # constraints remove DOF from the thermostat's temperature
        # (ref: Compute::adjust_dof_fix; fix_nh holds a temperature compute)
        fdof = self.fix_dof()
        if (fdof and hasattr(integrator, "extra_dof")
                and integrator.extra_dof is None):
            integrator = dataclasses.replace(
                integrator, extra_dof=state.dimension + fdof
            )
        self.integrator = integrator

        self.nl: nbr.NeighborList | None = None
        self.thermo_norm: bool | None = None  # thermo_modify norm
        # shrink-wrapped dims for thermo box extent: {dim: (lo_s, hi_s,
        # small)} (ref: Domain::reset_box — 's' faces track atom extent
        # +/- SMALL*initial box length; dynamics are unaffected here, the
        # working box stays at the data-file bounds)
        self.shrink_dims: dict = {}
        self.ntimestep = 0
        self._segment_cache: dict = {}
        self.last_loop_time = 0.0

    # -- forces -------------------------------------------------------------

    def force_fn(self, state: State, nl, eflag: bool, vflag: bool):
        return self.forcefield.compute(state, nl, eflag, vflag)

    def torque_fn(self, state: State, nl):
        """Per-atom torque from the pair style (atom->torque analog);
        None when the force field produces no torques."""
        ff = self.forcefield
        if not getattr(ff.pair, "has_torque", False):
            return None
        sp = ff.special
        return ff.pair.compute_torque(
            state, nl,
            special_lj=sp.weights_lj if sp is not None else None,
            special_coul=sp.weights_coul if sp is not None else None)

    def _refresh_torque(self):
        if getattr(self.forcefield.pair, "has_torque", False):
            t = self.torque_fn(self.state, self.nl)
            self.state = self.state.replace(aux={
                **self.state.aux, "torque": t})

    # -- setup (ref: Verlet::setup, src/verlet.cpp:93) ----------------------

    def setup(self):
        self.state = self.integrator.setup(self.state)
        for fx in self.fixes:
            self.state = fx.setup(self.state)
        if "nh_run" not in self.state.aux:
            # run window for t_target ramps (ref: update->beginstep/endstep;
            # consumed by FixNH and the temp/langevin fixes)
            self.state = self.state.replace(aux={
                **self.state.aux, "nh_run": jnp.zeros(2, dtype=jnp.int32)})
        cutneigh = self.forcefield.max_cutoff() + self.skin
        params = nbr.size_for_system(
            self.state,
            cutneigh=cutneigh,
            skin=self.skin,
            every=self.neigh_every,
            delay=self.neigh_delay,
            check=self.neigh_check,
        )
        x, image = self.state.box.wrap(self.state.x, self.state.image)
        self.state = self.state.replace(x=x, image=image)
        self._pick_list_mode(params)
        if self.list_mode in ("cell", "grid", "sorted"):
            # dense-path cost scales with cell_cap^2: size tightly and let
            # the overflow-retry loop absorb density fluctuations
            params = nbr.size_for_system(
                self.state, cutneigh=cutneigh, skin=self.skin,
                every=self.neigh_every, delay=self.neigh_delay,
                check=self.neigh_check, cell_pad=1.12, cell_round=2,
            )
        if self.list_mode == "sorted":
            params = self._optimize_sorted_grid(params, cutneigh)
            params = self._align_cell_cap(params)
        self.nl = self._build_list(self.state, params)
        self._check_overflow_and_grow()
        if getattr(self.pair_style, "is_granular", False):
            from .ops import gridforce as _gf

            if isinstance(self.nl, _gf.GridCells):
                p = self.nl.params
                want = (p.total_cells, p.cell_cap, 27, p.cell_cap)
            else:
                want = tuple(self.nl.idx.shape)
            sh = self.state.aux.get("gran_shear")
            if sh is None or sh.shape[:-1] != want:
                sh = jnp.zeros(want + (3,), dtype=self.state.dtype)
            # setup force pass: shearupdate off (ref: update->setupflag)
            f, tq, sh = self.pair_style.compute_gran(
                self.state, self.nl, sh, False)
            self.state = self.state.replace(f=f, aux={
                **self.state.aux, "torque": tq, "gran_shear": sh})
            for fx in self.fixes:
                self.state = fx.setup_post_force(self.state)
            self._segment_cache.clear()
            return
        vflag = self.integrator.needs_virial or any(
            getattr(fx, "needs_virial", False) for fx in self.fixes)
        f, _, _, virial = self.force_fn(self.state, self.nl, False, vflag)
        self.state = self.state.replace(f=f)
        if vflag:
            self.state = self.state.replace(virial=virial)
        self._refresh_torque()
        # setup applies post_force hooks so step 1's first half-kick sees
        # the modified forces (ref: Modify::setup -> fix->setup -> post_force,
        # src/fix_setforce.cpp setup; SHAKE's setup variant projects
        # coordinates + uses a half-kick prediction, fix_shake.cpp:465-512)
        for fx in self.fixes:
            self.state = fx.setup_post_force(self.state)
        if self.respa is not None:
            from .integrate.respa import make_respa_step

            _, setup_forces = make_respa_step(
                self.integrator, self.forcefield, self.respa, self.fixes,
                special=self.forcefield.special)
            self.state = setup_forces(self.state, self.nl)
        self._segment_cache.clear()

    def presetup_forces(self):
        """The `run ... pre yes` force pass between consecutive runs
        (ref: Verlet::setup re-run): recompute forces from the current
        state and re-apply post_force hooks — NO fix/integrator state
        reset (NH chains etc. survive)."""
        if getattr(self.pair_style, "is_granular", False):
            f, tq, sh = self.pair_style.compute_gran(
                self.state, self.nl, self.state.aux["gran_shear"], False)
            self.state = self.state.replace(f=f, aux={
                **self.state.aux, "torque": tq, "gran_shear": sh})
            for fx in self.fixes:
                self.state = fx.setup_post_force(self.state)
            return
        vflag = self.integrator.needs_virial or any(
            getattr(fx, "needs_virial", False) for fx in self.fixes)
        f, _, _, virial = self.force_fn(self.state, self.nl, False, vflag)
        self.state = self.state.replace(f=f)
        if vflag:
            self.state = self.state.replace(virial=virial)
        self._refresh_torque()
        for fx in self.fixes:
            self.state = fx.setup_post_force(self.state)

    def _pick_list_mode(self, params):
        """Grid-roll dense path when the force field is a bare pair_terms
        style with no special bonds / kspace / bonded terms (the bench hot
        path; ops/gridforce); otherwise the [N,K] matrix engine. `cell`
        (ops/cellforce) remains selectable explicitly."""
        ff = self.forcefield
        if self.respa is not None:
            self.list_mode = "matrix"  # rRESPA slices categories per level
            return
        if self._list_mode_req != "auto":
            self.list_mode = self._list_mode_req
            if self.list_mode == "zwin":
                from .ops import zwin

                zp = zwin.size_for_system(
                    self.state, params.cutneigh, params.skin,
                    every=params.every, delay=params.delay,
                    check=params.check)
                if zp is None:
                    raise ValueError("system too small for zwin columns")
                self._zwin_params = zp
            if self.list_mode == "molcell":
                from .ops import molcell

                mp = molcell.size_for_system(
                    self.state, params.cutneigh, params.skin,
                    params.every, params.delay, params.check)
                if mp is None:
                    raise ValueError("system too small for molcell bins")
                self._molcell_params = mp
            return
        two_pass = getattr(ff.pair, "dense_two_pass", False)
        dense_ok = (
            ff.pair is not None
            and (hasattr(ff.pair, "pair_terms") or two_pass)
            and ff.special is None
            and ff.kspace is None
            and ff.bond is None and ff.angle is None
            and ff.dihedral is None and ff.improper is None
            and not params.all_pairs
        )
        if not dense_ok:
            self.list_mode = "matrix"
            return
        if two_pass:
            # EAM-class styles: the exact spline path stays the default
            # (bit-parity with the reference's golden logs); the resampled
            # dense path (ops/eamdense, force err < ~1e-3 rel) is opt-in
            # via list_mode="grid"
            self.list_mode = "matrix"
            return
        # cell-major (sorted) state: fastest auto path, needs a
        # scalarizable style, a fully periodic orthogonal box, and no aux
        # fixes carrying per-atom state (ops/sortedforce). The retired
        # z-column experiment's windowing idea lives on as the sorted
        # kernel's z-chunked pair loop (ops/pallas_pair v2).
        kk = getattr(ff.pair, "kernel_key", None)
        sorted_ok = (
            kk is not None and kk() is not None
            and all(self.state.box.periodic)
            and not self.state.box.triclinic
            and not self.fixes
            and not self.integrator.needs_virial  # barostats move the box
        )
        self.list_mode = "sorted" if sorted_ok else "grid"

    def _build_list(self, state, params):
        if self.list_mode == "zwin":
            from .ops import zwin

            if not isinstance(params, zwin.ZwinParams):
                params = self._zwin_params
            state = zwin.expand_state(state, params)
            state, nl = jax.jit(zwin.build, static_argnums=1)(
                state, params)
            self.state = state
            return nl
        if self.list_mode == "sorted":
            from .ops import sortedforce

            # sorted mode owns the state layout: expand to the cell-major
            # capacity and permute (self.state is replaced)
            state = sortedforce.expand_state(state, params)
            state, nl = sortedforce.build(state, params)
            self.state = state
            return nl
        if self.list_mode == "grid":
            from .ops import gridforce

            return gridforce.build_cell(state, params)
        if self.list_mode == "cell":
            from .ops import cellforce

            return cellforce.build_cell(state, params)
        if self.list_mode == "molcell":
            from .ops import molcell

            if not isinstance(params, molcell.MolCellParams):
                params = self._molcell_params
            return molcell.build_cell(state, params,
                                      special=self.forcefield.special)
        return nbr.build(state, params, special=self.forcefield.special)

    def _optimize_sorted_grid(self, params, cutneigh):
        """Pick the cell grid minimizing the dense kernel's pair-math cost
        ntot * cc_aligned^2. choose_grid's max-cells-with-edge>=cutneigh
        grid can land just past an occupancy boundary (e.g. 37^3 cells at
        19.7 atoms/cell where 33^3 gives 27.8 at the same aligned cap of
        32): fewer, fuller cells do the same physics with up to ~30% fewer
        padded candidate lanes. One FINER grid (d=-1) is also considered
        when its edge shortfall is < 0.1% of cutneigh — float-grid
        roundoff territory (the 32k bench box is 11.997 cutneighs wide:
        12 cells shrink the capture radius by 0.015% of the SKIN, far
        inside the every-20/check-no policy's own tolerance, and cost
        ~20% fewer candidate lanes than 11). Occupancies are exact host
        bincounts on the setup configuration, padded for equilibrium
        density fluctuations; a mid-run burst past the cap is healed by
        the overflow grow-retry loop."""
        nx, ny, nz = params.ncells
        if min(nx, ny, nz) < 4:
            return params

        import dataclasses as _dc

        import numpy as np

        heights = np.asarray(nbr.box_heights(self.state.box))
        nvalid = int(jax.device_get(self.state.nlocal))

        def aligned_cap(max_cell, avg):
            # the setup snapshot (often a commensurate lattice with
            # artificially uniform bins) underestimates the run-time max:
            # equilibrium density fluctuations reach ~ avg + 2.4 sqrt(avg)
            # (measured across grids on the 10k-step 32k LJ melt); take
            # the larger of snapshot+1 and the fluid model
            tight = max(max_cell, int(avg + 2.4 * avg ** 0.5 + 1), 4)
            r32 = max(32, ((tight + 31) // 32) * 32)
            r8 = ((tight + 7) // 8) * 8
            # 32-lane-aligned scratch offsets store ~1.5x faster; prefer
            # them unless the overshoot exceeds the store win
            return r32 if r32 <= r8 * 1.3 else r8

        best, best_cost, best_cc = None, None, None
        for d in range(-1, 4):
            nc = (max(3, nx - d), max(3, ny - d), max(3, nz - d))
            if d < 0:
                edges = heights / np.asarray(nc)
                if np.any(edges < cutneigh * 0.999):
                    continue
            counts = np.bincount(
                nbr._cell_ids_host(self.state, nc),
                minlength=nc[0] * nc[1] * nc[2] + 1)
            max_cell = int(counts[:-1].max())
            cc = aligned_cap(max_cell, nvalid / (nc[0] * nc[1] * nc[2]))
            # pair lanes = cells x ceil8(cc) own sublanes x 14*cc cand lanes
            cost = nc[0] * nc[1] * nc[2] * (-(-cc // 8) * 8) * cc
            if best_cost is None or cost < best_cost:
                best, best_cost, best_cc = nc, cost, cc
        if best is None:
            return params
        grown = nbr.size_for_system(
            self.state, cutneigh=cutneigh, skin=self.skin,
            every=self.neigh_every, delay=self.neigh_delay,
            check=self.neigh_check, cell_pad=1.12, cell_round=2,
            ncells=best)
        return _dc.replace(grown, cell_cap=best_cc)

    @staticmethod
    def _align_cell_cap(params):
        """Round cell_cap to a lane-friendly width for the sorted mode's
        Pallas kernels: multiples of 32 store ~1.5x faster at scratch
        slice offsets (measured, benchmarks/prof), but pair-math cost
        scales linearly with cell_cap — so fall back to the next multiple
        of 8 when the 32-multiple overshoots by more than ~30%."""
        import dataclasses as _dc

        cc = params.cell_cap
        # recover the observed max occupancy from the tight cap's known
        # 1.12 pad, then take the smallest 32-multiple that still holds it
        # (+1 atom of slack); a mid-run burst past it is healed by the
        # overflow-grow-retry loop like any other density fluctuation
        est_max = max(1, int((cc - 1) / 1.12))
        r32 = max(32, ((est_max + 1 + 31) // 32) * 32)
        r8 = max(8, ((est_max + 1 + 7) // 8) * 8)
        return _dc.replace(params, cell_cap=r32 if r32 <= r8 * 1.3 else r8)

    def _grow_params(self, params):
        from .ops import molcell, zwin

        if isinstance(params, zwin.ZwinParams):
            grown = zwin.grow(params, self.state)
            self._zwin_params = grown
            return grown
        if isinstance(params, molcell.MolCellParams):
            grown = molcell.grow(params)
            self._molcell_params = grown
            return grown
        if self.list_mode == "sorted":
            # occupancy-aware growth: pair-math cost scales linearly with
            # cell_cap, so measure the ACTUAL needed capacity from the
            # current state instead of blindly multiplying (the blind
            # x1.3-then-align-to-32 path jumped 38 -> 64 on the 32k melt
            # where 40 suffices — a 33% throughput tax)
            import dataclasses as _dc

            import numpy as np

            counts = np.bincount(
                nbr._cell_ids_host(self.state, params.ncells),
                minlength=params.total_cells + 1)[:-1]
            need = int(counts.max()) + 3  # margin for in-segment drift
            cc = max(-(-need // 8) * 8, params.cell_cap + 8)
            r32 = ((cc + 31) // 32) * 32
            if r32 <= cc * 1.3:
                cc = r32
            return _dc.replace(params, cell_cap=cc,
                               K=int(params.K * 1.3) + 8)
        return nbr.grow(params)

    def retune(self):
        """Re-measure capacity-class static sizes on the CURRENT
        configuration and rebuild if meaningfully tighter. The zwin
        windows are sized at setup on the initial configuration — a cold
        lattice start (commensurate planes, huge column-count disparity)
        inflates them far past the equilibrated liquid's needs; one
        re-tune after warmup reclaims the slack (host-side analog of the
        reference re-running neighbor setup_bins on density change)."""
        if self.list_mode != "zwin" or self.nl is None:
            return False
        from .ops import zwin

        p = self.nl.params
        fresh = zwin.size_for_system(
            self.state, p.cutneigh, p.skin,
            every=p.every, delay=p.delay, check=p.check)
        if fresh is None:
            return False
        # margins over the instantaneous measurement (density breathes)
        import dataclasses as _dc

        fresh = _dc.replace(
            fresh, S=fresh.S + 8, WS=fresh.WS + 8, WN=fresh.WN + 16,
            OFF=fresh.OFF + 8)
        fresh = _dc.replace(
            fresh, G=int(-(-max(fresh.G + 8, fresh.OFF,
                                fresh.WN - fresh.OFF - 8,
                                fresh.WS - 8) // 8) * 8))
        if fresh.G > fresh.S:
            fresh = _dc.replace(fresh, G=fresh.S)
        gain = (p.WS + 4 * p.WN) - (fresh.WS + 4 * fresh.WN)
        if fresh == p or gain < 32:
            return False
        self._zwin_params = fresh
        self.nl = self._build_list(self.state, fresh)
        self._check_overflow_and_grow()
        return True

    def _check_overflow_and_grow(self, max_tries: int = 8):
        for _ in range(max_tries):
            if not bool(jax.device_get(self.nl.overflow)):
                return
            params = self._grow_params(self.nl.params)
            self.nl = self._build_list(self.state, params)
        raise RuntimeError("neighbor capacity growth did not converge")

    # -- run ----------------------------------------------------------------

    def _get_segment_runner(self):
        key = (self.nl.params, self.state.capacity)
        runner = self._segment_cache.get(key)
        if runner is None:
            from .integrate.verlet import Integrator as _BaseNVE

            kk = getattr(self.forcefield.pair, "kernel_key", None)
            if (self.list_mode == "sorted" and self.respa is None
                    and not self.fixes
                    and type(self.integrator) is _BaseNVE
                    and kk is not None and kk() is not None):
                # bench hot path: fused planar NVE segment (zero per-step
                # transposes/gathers; see integrate/fused.py)
                from .integrate.fused import make_sorted_nve_segment

                runner = make_sorted_nve_segment(
                    self.integrator, self.forcefield.pair,
                    special=self.forcefield.special)
                self._segment_cache[key] = runner
                return runner
            if self.respa is not None:
                from .integrate.respa import make_respa_step

                step, _ = make_respa_step(
                    self.integrator, self.forcefield, self.respa,
                    self.fixes, special=self.forcefield.special)
            else:
                gran = (self.pair_style if getattr(
                    self.pair_style, "is_granular", False) else None)
                step = make_step(
                    self.integrator, self.force_fn, self.fixes,
                    special=self.forcefield.special,
                    torque_fn=(self.torque_fn if gran is None and getattr(
                        self.forcefield.pair, "has_torque", False) else None),
                    gran=gran,
                )

            def run_segment(state, nl, nsteps: int):
                def body(carry, _):
                    s, l = step(*carry)
                    return (s, l), None

                (state, nl), _ = jax.lax.scan(
                    body, (state, nl), None, length=nsteps
                )
                return nbr.poison_on_overflow(state, nl), nl

            runner = jax.jit(run_segment, static_argnums=2)
            self._segment_cache[key] = runner
        return runner

    def run(
        self,
        nsteps: int,
        thermo_every: int = 0,
        on_thermo: Callable[[int, dict], None] | None = None,
        print_thermo: bool = False,
        halt: Callable[[dict], bool] | None = None,
        timeout_s: float | None = None,
    ) -> list[dict]:
        """Advance nsteps; emit thermo rows at the cadence (incl. first/last),
        like Output::setup/write (ref: src/output.cpp:189,339).

        Failure detection (SURVEY.md §5): non-finite thermo raises
        immediately (the lost-atom / NaN guard analog of
        thermo_modify lost error); `halt` mirrors `fix halt` (condition
        checked at output cadence); `timeout_s` mirrors `timer timeout`
        (graceful stop past the wall-clock budget)."""
        if self.nl is None:
            self.setup()

        # install the run window for target ramps (ref: update->beginstep/
        # endstep used by FixNH::compute_temp_target)
        if "nh_run" in self.state.aux:
            begin = int(jax.device_get(self.state.ntimestep))
            self.state = self.state.replace(
                aux={
                    **self.state.aux,
                    "nh_run": jnp.asarray([begin, begin + nsteps], dtype=jnp.int32),
                }
            )
            self.state = self.integrator.refresh_segment(self.state)
            for fx in self.fixes:
                self.state = fx.refresh_segment(self.state)

        rows = []

        import math

        halted = {"flag": False}

        def emit(step_no):
            row = self.thermo()
            row["step"] = step_no
            rows.append(row)
            if print_thermo:
                _print_thermo_row(row)
            if not all(math.isfinite(v) for k, v in row.items()
                       if isinstance(v, float)):
                raise RuntimeError(
                    f"non-finite thermo at step {step_no}: {row} "
                    "(simulation unstable — lost atoms or bad dynamics)"
                )
            if halt is not None and halt(row):
                halted["flag"] = True
            if on_thermo is not None:
                on_thermo(step_no, row)

        t0 = time.perf_counter()
        emit(self.ntimestep)

        done = 0
        while done < nsteps:
            if thermo_every > 0:
                next_out = min(
                    nsteps, ((done // thermo_every) + 1) * thermo_every
                )
            else:
                next_out = nsteps
            seg = next_out - done
            self._run_segment_retry(seg)
            done = next_out
            self.ntimestep += seg
            emit(self.ntimestep)
            if halted["flag"]:
                break
            if timeout_s is not None and (
                    time.perf_counter() - t0) > timeout_s:
                break

        self.state.x.block_until_ready()
        self.last_loop_time = time.perf_counter() - t0
        return rows

    def _run_segment_retry(self, seg: int, max_tries: int = 8):
        snap_state, snap_nl = self.state, self.nl
        for _ in range(max_tries):
            runner = self._get_segment_runner()
            state, nl = runner(self.state, self.nl, seg)
            if not bool(jax.device_get(nl.overflow)):
                self.state, self.nl = state, nl
                return
            # capacity overflow inside the segment: grow, rebuild from the
            # snapshot, and re-run the whole segment with the new shapes
            # (restore the snapshot FIRST — the post-segment state is
            # NaN-poisoned, and occupancy-aware growth reads self.state;
            # grow from the CURRENT params so repeated retries compound
            # instead of re-deriving the same capacity from the snapshot)
            cur_params = self.nl.params
            self.state = snap_state
            params = self._grow_params(cur_params)
            self.nl = dataclasses.replace(
                self._build_list(snap_state, params),
                nbuilds=snap_nl.nbuilds,
                ndanger=snap_nl.ndanger,
            )
            self._check_overflow_and_grow()
            if "gran_shear" in self.state.aux:
                from .models.pair_gran import remap_shear

                self.state = self.state.replace(aux={
                    **self.state.aux,
                    "gran_shear": remap_shear(
                        self.state.aux["gran_shear"],
                        snap_nl.idx, self.nl.idx)})
        raise RuntimeError("neighbor overflow retry did not converge")

    # -- observables --------------------------------------------------------

    def fix_dof(self) -> int:
        """DOF removed by constraints (ref: Compute::adjust_dof_fix sums
        fix->dof() over fixes; FixShake removes one per constraint)."""
        return sum(int(getattr(fx, "n_constraints", 0) or 0)
                   for fx in self.fixes)

    def total_extra_dof(self) -> int:
        base = (self.extra_dof if self.extra_dof is not None
                else self.state.dimension)
        return base + self.fix_dof()

    def thermo(self) -> dict:
        """Current thermo keywords (ref: src/thermo.cpp:815-905 subset)."""
        u = self.units
        st, nl = self.state, self.nl
        f, epair, emol, virial = self.force_fn(st, nl, True, True)
        if epair is None:
            epair = jnp.zeros((), st.dtype)
        if emol is None:
            emol = jnp.zeros((), st.dtype)
        extra = self.total_extra_dof()
        t = thermo_mod.temperature(st, u, extra)
        ke = thermo_mod.kinetic_energy(st, u)
        press = thermo_mod.pressure(st, virial, u, t, extra)
        n = jax.device_get(st.nlocal)
        # thermo_modify norm yes/no overrides the units default
        # (ref: src/thermo.cpp normflag / lostflag modify_params)
        norm = (self.thermo_norm if self.thermo_norm is not None
                else u.norm_default)
        ep_v, em_v, ke_v, t_v, p_v = jax.device_get((epair, emol, ke, t, press))
        vol = float(jax.device_get(st.box.volume))
        if self.shrink_dims:
            lo_b = np.array(jax.device_get(st.box.lo), dtype=float)
            hi_b = np.array(jax.device_get(st.box.hi), dtype=float)
            xs = np.asarray(jax.device_get(st.x))
            vmask = np.asarray(jax.device_get(st.valid_mask))
            for d, (lo_s, hi_s, small) in self.shrink_dims.items():
                if lo_s:
                    lo_b[d] = xs[vmask, d].min() - small
                if hi_s:
                    hi_b[d] = xs[vmask, d].max() + small
            vol = float(np.prod(hi_b - lo_b))
        if norm:
            ep_v = ep_v / n
            em_v = em_v / n
            ke_v = ke_v / n
        pe_v = ep_v + em_v
        ptens = jax.device_get(thermo_mod.pressure_tensor(st, virial, u))
        fmag = jnp.where(st.valid_mask[:, None], f, 0.0)
        fnorm = float(jax.device_get(jnp.sqrt(jnp.sum(fmag * fmag))))
        fmax = float(jax.device_get(jnp.max(jnp.abs(fmag))))
        lo = jax.device_get(st.box.lo)
        hi = jax.device_get(st.box.hi)
        row = {
            "temp": float(t_v),
            "epair": float(ep_v),
            "emol": float(em_v),
            "ke": float(ke_v),
            "pe": float(pe_v),
            "etotal": float(pe_v + ke_v),
            "press": float(p_v),
            "vol": vol,
            "natoms": int(n),
            "fnorm": fnorm,
            "fmax": fmax,
            "enthalpy": float(pe_v + ke_v) + float(p_v) * vol
            / (n if norm else 1) / u.nktv2p,
            "dt": self.dt,
        }
        for i, k in enumerate(("pxx", "pyy", "pzz", "pxy", "pxz", "pyz")):
            row[k] = float(ptens[i])
        for d, k in enumerate(("xlo", "ylo", "zlo")):
            row[k] = float(lo[d])
        for d, k in enumerate(("xhi", "yhi", "zhi")):
            row[k] = float(hi[d])
        return row


def _print_thermo_row(row: dict):
    print(
        f"{row['step']:>10d} {row['temp']:>14.8g} {row['epair']:>14.8g} "
        f"{row['emol']:>14.8g} {row['etotal']:>14.8g} {row['press']:>14.8g}"
    )
