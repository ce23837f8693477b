"""Preset systems mirroring the reference benchmark decks.

These reproduce the setup phase of the committed decks bit-for-bit
(positions and initial velocities), so thermo output can be compared
directly against the reference's golden logs:

  - lj_melt:  bench/in.lj & examples/melt/in.melt (fcc LJ melt, NVE)
  - eam_bulk: bench/in.eam (bulk fcc Cu, EAM, NVE)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .core.box import Box
from .core.lattice import Lattice, create_atoms
from .core.state import State, create_state
from .core.velocity import create_velocities_geom
from .models.pair_lj import make_lj_cut
from .utils.units import get_units


def lj_melt_state(
    cells=10,
    rho: float = 0.8442,
    t_init: float = 3.0,
    seed: int = 87287,
    dtype=jnp.float32,
) -> State:
    """`lattice fcc rho; region box block 0 n 0 n 0 n; create_atoms; mass 1 1;
    velocity all create T seed loop geom` (ref: examples/melt/in.melt,
    bench/in.lj with t_init=1.44, cells=20). `cells` may be a scalar or a
    per-dim tuple."""
    units = get_units("lj")
    lat = Lattice(style="fcc", scale=rho, units_name="lj", dimension=3)
    sp = lat.spacing
    lo = np.zeros(3)
    if np.isscalar(cells):
        cells = (cells, cells, cells)
    hi = np.array(cells, dtype=np.float64) * sp
    x, types = create_atoms(lat, lo, hi, type_id=1)
    masses = np.array([1.0, 1.0])  # slot 0 + type 1
    m_per_atom = masses[types]
    v = create_velocities_geom(
        x, m_per_atom, t_desired=t_init, seed=seed, units=units
    )
    box = Box.create(lo, hi, dtype=jnp.float64)
    return create_state(
        x, box, types=types, velocities=v, masses=masses,
        units_name="lj", dtype=dtype,
    )


def lj_melt_pair(dtype=jnp.float32):
    """pair_style lj/cut 2.5; pair_coeff 1 1 1.0 1.0 2.5"""
    return make_lj_cut(
        ntypes=1, coeffs={(1, 1): (1.0, 1.0)}, cut_global=2.5, dtype=dtype
    )


def eam_bulk_cu_state(
    cells: int = 20,
    a0: float = 3.615,
    t_init: float = 1600.0,
    seed: int = 376847,
    potential_path: str = "/root/reference/bench/Cu_u3.eam",
    dtype=jnp.float32,
) -> State:
    """bench/in.eam setup: metal units, fcc Cu 3.615, velocity create 1600
    376847 loop geom. Mass comes from the potential file (funcfl sets it)."""
    from .io.eam_reader import read_funcfl

    units = get_units("metal")
    ff = read_funcfl(potential_path)
    lat = Lattice(style="fcc", scale=a0, units_name="metal", dimension=3)
    sp = lat.spacing
    lo = np.zeros(3)
    hi = np.array([cells, cells, cells], dtype=np.float64) * sp
    x, types = create_atoms(lat, lo, hi, type_id=1)
    masses = np.array([1.0, ff.mass])
    v = create_velocities_geom(
        x, masses[types], t_desired=t_init, seed=seed, units=units
    )
    box = Box.create(lo, hi, dtype=jnp.float64)
    return create_state(
        x, box, types=types, velocities=v, masses=masses,
        units_name="metal", dtype=dtype,
    )


def eam_bulk_cu_sim(
    cells: int = 20,
    t_init: float = 1600.0,
    seed: int = 376847,
    potential_path: str = "/root/reference/bench/Cu_u3.eam",
    dtype=jnp.float32,
):
    """Full bench/in.eam Simulation: skin 1.0, every 1 delay 5 check yes,
    fix nve, timestep 0.005 ps."""
    from .models.pair_eam import make_eam_funcfl
    from .runner import Simulation

    state = eam_bulk_cu_state(
        cells=cells, t_init=t_init, seed=seed,
        potential_path=potential_path, dtype=dtype,
    )
    pair = make_eam_funcfl(ntypes=1, files={1: potential_path}, dtype=dtype)
    return Simulation(
        state,
        pair,
        dt=0.005,
        skin=1.0,
        neigh_every=1,
        neigh_delay=5,
        neigh_check=True,
    )


def chain_sim(
    data_path: str = "/root/reference/bench/data.chain",
    langevin_seed: int = 904297,
    dtype=jnp.float32,
):
    """bench/in.chain: FENE bead-spring melt. atom_style bond,
    special_bonds fene (lj/coul 0 1 1), lj/cut 1.12 shifted, bond fene
    30 1.5 1 1, nve + langevin 1.0 1.0 10.0, dt 0.012, skin 0.4,
    neigh_modify every 1 delay 1."""
    from .core.topology import build_special, pad_topology
    from .integrate.fixes import FixLangevin
    from .models.bonded import make_bond_fene
    from .models.forcefield import ForceField
    from .runner import Simulation

    from .io.data_reader import read_data

    df = read_data(data_path, atom_style="bond")
    box = Box.create(
        [df.xlo, df.ylo, df.zlo], [df.xhi, df.yhi, df.zhi], dtype=jnp.float64
    )
    state = create_state(
        df.x, box, types=df.types, velocities=df.v, masses=df.masses,
        molecules=df.molecule, tags=df.tags, images=df.image,
        units_name="lj", dtype=dtype,
    )
    cap = state.capacity
    # tags are 1..N in file order -> local index = tag - 1
    bonds_local = np.stack(
        [df.bonds[:, 0], df.bonds[:, 1] - 1, df.bonds[:, 2] - 1], axis=1
    )
    top = pad_topology(cap, bonds=bonds_local)
    special = build_special(
        df.natoms, cap, bonds_local[:, 1:],
        weights_lj=(0.0, 1.0, 1.0), weights_coul=(0.0, 1.0, 1.0),
        mode="exclude",
    )
    pair = make_lj_cut(
        ntypes=df.natomtypes, coeffs={(1, 1): (1.0, 1.0)}, cut_global=1.12,
        shift=True, dtype=dtype,
    )
    bond = make_bond_fene(
        df.nbondtypes, {1: (30.0, 1.5, 1.0, 1.0)}, dtype=dtype
    )
    ff = ForceField(pair=pair, bond=bond, topology=top, special=special)
    units = get_units("lj")
    lange = FixLangevin(
        t_start=1.0, t_stop=1.0, t_period=10.0, seed=langevin_seed,
        dt=0.012, units=units,
    )
    return Simulation(
        state, ff, dt=0.012, skin=0.4,
        neigh_every=1, neigh_delay=1, neigh_check=True,
        fixes=(lange,),
    )


def tersoff_si_sim(
    cells=(20, 20, 10),
    a0: float = 5.431,
    t_init: float = 1000.0,
    seed: int = 376847,
    potential_path: str = "/root/reference/potentials/Si.tersoff",
    dtype=jnp.float32,
):
    """bench/POTENTIALS/in.tersoff: diamond Si, tersoff, NVE, dt 0.001,
    skin 1.0, every 1 delay 5, velocity create 1000 loop geom."""
    from .models.pair_tersoff import make_tersoff
    from .runner import Simulation

    units = get_units("metal")
    lat = Lattice(style="diamond", scale=a0, units_name="metal")
    sp = lat.spacing
    lo = np.zeros(3)
    hi = np.array(cells, dtype=np.float64) * sp
    x, types = create_atoms(lat, lo, hi, type_id=1)
    masses = np.array([1.0, 28.06])
    v = create_velocities_geom(
        x, masses[types], t_desired=t_init, seed=seed, units=units
    )
    box = Box.create(lo, hi, dtype=jnp.float64)
    state = create_state(
        x, box, types=types, velocities=v, masses=masses,
        units_name="metal", dtype=dtype,
    )
    pair = make_tersoff(1, potential_path, ["Si"], dtype=dtype)
    return Simulation(
        state, pair, dt=0.001, skin=1.0,
        neigh_every=1, neigh_delay=5, neigh_check=True,
    )


def lj_melt_sim(
    cells: int = 10,
    t_init: float = 3.0,
    seed: int = 87287,
    dtype=jnp.float32,
    every: int = 20,
    delay: int = 0,
    check: bool = False,
    list_mode: str = "auto",
):
    """Full melt Simulation ready to run (neigh_modify every 20 delay 0
    check no; skin 0.3; fix nve; dt 0.005)."""
    from .runner import Simulation

    state = lj_melt_state(cells=cells, t_init=t_init, seed=seed, dtype=dtype)
    pair = lj_melt_pair(dtype=dtype)
    return Simulation(
        state,
        pair,
        skin=0.3,
        neigh_every=every,
        neigh_delay=delay,
        neigh_check=check,
        list_mode=list_mode,
    )
