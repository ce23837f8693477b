"""Device mesh + array sharding helpers.

The reference scales via MPI domain decomposition (ref: src/comm.cpp
set_proc_grid, src/comm_brick.cpp). The TPU-native analogs, in order of
sophistication:

  1. GSPMD atom-sharding (this module): per-atom arrays sharded over a 1D
     mesh axis inside plain jit; XLA inserts the collectives for the
     neighbor/force gathers. Zero host logic, correct by construction.
  2. shard_map spatial decomposition with explicit ppermute ghost halos
     (parallel/domain.py) — the performance path mirroring CommBrick's
     forward/reverse/borders/exchange verbs on ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "atoms") -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def shard_state_atoms(state, mesh: Mesh, axis_name: str = "atoms"):
    """Shard every per-atom array along dim 0; replicate everything else."""
    atom_sharding = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    cap = state.capacity

    def place(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == cap:
            return jax.device_put(leaf, atom_sharding)
        return jax.device_put(leaf, rep)

    return jax.tree.map(place, state)


def shard_neighbor_atoms(nl, mesh: Mesh, axis_name: str = "atoms"):
    """Shard the neighbor matrix rows; replicate scalars."""
    atom_sharding = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    cap = nl.idx.shape[0]

    def place(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == cap:
            return jax.device_put(leaf, atom_sharding)
        return jax.device_put(leaf, rep)

    return jax.tree.map(place, nl)
