"""lammps_kokkos_port_tpu: a TPU-native molecular dynamics framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of LAMMPS +
its Kokkos accelerator package (reference surveyed in SURVEY.md): classical
MD with cell-list neighbor finding, short-range pair potentials (lj/cut,
EAM, Tersoff, SNAP, CHARMM), bonded terms, PPPM long-range electrostatics,
velocity-Verlet integration with NVE/NVT/NPT, and spatial domain
decomposition over TPU meshes via sharded arrays + ICI collectives.

The whole timestep is one jit-compiled function with no host round-trips;
state is a single immutable pytree of fixed-shape padded arrays.
"""

__version__ = "0.1.0"

from .core.box import Box
from .core.state import State, create_state
from .runner import Simulation
from .utils.units import get_units
