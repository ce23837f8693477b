"""Per-atom state: the TPU-native equivalent of Atom/AtomVec.

The reference stores per-atom data as growable SoA arrays owned by `Atom`
(ref: src/atom.h:70-170) with AtomVec styles declaring which fields exist
(ref: src/atom_vec.h:62-123). Here the whole simulation state is ONE immutable
pytree of fixed-shape padded device arrays, so a full MD step can be traced
and compiled once:

  - capacity (`cap`) is a static padded size >= number of atoms;
  - entries [nlocal:) are padding: type 0, tag 0, position at the box origin,
    excluded from neighbor lists by masking (they are binned into a dead
    overflow cell, see ops/neighbor.py);
  - optional fields (charge, molecule) are None when the atom style doesn't
    carry them — the pytree simply has fewer leaves, the analog of AtomVec
    existence flags (ref: src/atom.h:178-200).

Image flags are an int32 [cap,3] array counting periodic wraps per dimension
(the unpacked form of the reference's bit-packed imageint,
ref: src/lmptype.h:89-152); they feed unwrapped coordinates (MSD, bonds
across boundaries).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .box import Box

Array = jax.Array

_DATA_FIELDS = [
    "x", "v", "f", "type", "tag", "image", "q", "molecule", "box",
    "mass", "nlocal", "mask", "virial", "ntimestep", "aux",
]
_META_FIELDS = ["units_name", "dimension", "owned_all"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=_DATA_FIELDS,
    meta_fields=_META_FIELDS,
)
@dataclasses.dataclass(frozen=True)
class State:
    """Simulation state pytree (atoms + box).

    Types are 1-based as in the reference input language; padded atoms have
    type 0. Per-type mass lives in `mass` with shape [ntypes+1] (index 0
    unused, set to 1 so padded atoms never divide by zero).
    """

    x: Array  # [cap, 3] positions
    v: Array  # [cap, 3] velocities
    f: Array  # [cap, 3] forces
    type: Array  # [cap] int32, 1-based; 0 = padding
    tag: Array  # [cap] int32 atom IDs, 1-based; 0 = padding
    image: Array  # [cap, 3] int32 periodic image counts
    q: Array | None  # [cap] charge, or None
    molecule: Array | None  # [cap] int32 molecule IDs, or None
    box: Box
    mass: Array  # [ntypes+1] per-type mass
    nlocal: Array  # scalar int32: number of real atoms
    # group membership bitmask, bit 0 = group "all" (ref: src/group.h:28 —
    # up to 32 named groups as bits in per-atom mask); 0 for padding
    mask: Array  # [cap] int32
    # Voigt virial from the most recent force evaluation (zeros unless a
    # barostat requires per-step tallying; thermo recomputes fresh)
    virial: Array  # [6]
    ntimestep: Array  # scalar int32 (ref: update->ntimestep)
    # named per-fix internal state (thermostat/barostat chains, etc.) —
    # the analog of per-fix restart payloads (ref: src/fix_nh.cpp:1273)
    aux: dict
    units_name: str = "lj"
    dimension: int = 3
    # True when every valid row is an owned atom at an ARBITRARY row index
    # (the cell-major sorted layout, ops/sortedforce); False = owned atoms
    # occupy rows [0, nlocal) and anything beyond is a ghost slot
    owned_all: bool = False

    # ---- static helpers ---------------------------------------------------

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def dtype(self):
        return self.x.dtype

    @property
    def valid_mask(self) -> Array:
        """[cap] bool: True for existing atoms (owned OR ghost copies).

        Derived from the group bitmask (bit 0 set on creation / ghost pack),
        so ghost slots at fixed offsets beyond nlocal work in the sharded
        decomposition (parallel/domain.py) — the analog of nlocal+nghost
        extents in the reference (ref: src/atom.h:43-46).
        """
        return self.mask != 0

    @property
    def owned_mask(self) -> Array:
        """[cap] bool: True only for atoms this shard owns (never ghosts).

        Energy/virial tallies sum owned rows only: a cross-shard pair is
        half-counted by each owner and psum restores the exact global total
        (the FULL-list newton-off convention, ref: pair_kokkos.h ev_tally).
        """
        if self.owned_all:
            return self.valid_mask
        return (jnp.arange(self.capacity, dtype=jnp.int32) < self.nlocal) \
            & self.valid_mask

    @property
    def per_atom_mass(self) -> Array:
        """[cap] mass of each atom via its type; finite-size styles store
        per-atom masses instead (ref: atom->rmass vs atom->mass — sphere
        atoms carry rmass from diameter/density, atom_vec_sphere.cpp
        data_atom), threaded through aux so it shards with the atoms."""
        rm = self.aux.get("rmass")
        if rm is not None:
            return rm
        return self.mass[self.type]

    def group_mask(self, groupbit: int) -> Array:
        """[cap] bool membership for a group bit pattern
        (ref: `mask[i] & groupbit` tests, e.g. src/fix_nve.cpp:76)."""
        return (self.mask & jnp.int32(groupbit)) != 0

    def replace(self, **kwargs) -> "State":
        return dataclasses.replace(self, **kwargs)


def atom_order(state: State) -> np.ndarray:
    """Host: row indices of the real atoms in TAG order — the
    layout-agnostic atom view (compact layouts return arange(nlocal);
    the cell-major sorted layout returns its scattered rows). Use this in
    every host-side extraction instead of `[:nlocal]`."""
    valid = np.asarray(jax.device_get(state.valid_mask))
    idx = np.flatnonzero(valid)
    tags = np.asarray(jax.device_get(state.tag))[idx]
    return idx[np.argsort(tags, kind="stable")]


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def create_state(
    x: np.ndarray,
    box: Box,
    types: np.ndarray | None = None,
    velocities: np.ndarray | None = None,
    masses: np.ndarray | None = None,
    charges: np.ndarray | None = None,
    molecules: np.ndarray | None = None,
    tags: np.ndarray | None = None,
    images: np.ndarray | None = None,
    units_name: str = "lj",
    dimension: int = 3,
    dtype=jnp.float32,
    capacity: int | None = None,
    pad_multiple: int = 8,
) -> State:
    """Build a State from host (numpy) setup data, padding to capacity."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    cap = capacity if capacity is not None else round_up(max(n, 1), pad_multiple)
    if cap < n:
        raise ValueError(f"capacity {cap} < natoms {n}")

    if types is None:
        types = np.ones(n, dtype=np.int32)
    types = np.asarray(types, dtype=np.int32)
    ntypes = int(types.max()) if n else 1

    if masses is None:
        masses = np.ones(ntypes + 1, dtype=np.float64)
    else:
        masses = np.asarray(masses, dtype=np.float64)
        if masses.shape[0] == ntypes:  # caller gave per-type list without slot 0
            masses = np.concatenate([[1.0], masses])
    masses = masses.copy()
    masses[0] = 1.0  # padding slot must be finite/nonzero

    if velocities is None:
        velocities = np.zeros((n, 3), dtype=np.float64)
    if tags is None:
        tags = np.arange(1, n + 1, dtype=np.int32)

    def pad2(a, fill=0.0):
        out = np.full((cap, 3), fill, dtype=np.float64)
        out[:n] = a
        return out

    def pad1(a, fill, dt):
        out = np.full((cap,), fill, dtype=dt)
        out[:n] = a
        return out

    # padded atoms sit at the box origin; they are masked out of neighbor
    # lists structurally (binned into a dead cell), so their position only
    # needs to be finite.
    xp = np.tile(np.asarray(box.lo, dtype=np.float64), (cap, 1))
    xp[:n] = x

    # Convert dtypes in numpy BEFORE the device transfer: a plain device_put
    # never compiles, while an on-device convert triggers one tiny XLA
    # compilation per array (very expensive on remote-compile TPU backends).
    npdt = np.dtype(dtype)

    def dev(a):
        return jnp.asarray(np.asarray(a).astype(npdt, copy=False))

    groupmask = np.zeros(cap, dtype=np.int32)
    groupmask[:n] = 1  # bit 0 = group "all"

    return State(
        x=dev(xp),
        v=dev(pad2(velocities)),
        f=dev(np.zeros((cap, 3))),
        type=jnp.asarray(pad1(types, 0, np.int32)),
        tag=jnp.asarray(pad1(tags, 0, np.int32)),
        image=jnp.asarray(
            np.zeros((cap, 3), dtype=np.int32) if images is None
            else np.concatenate([
                np.asarray(images, dtype=np.int32),
                np.zeros((cap - n, 3), dtype=np.int32),
            ])
        ),
        q=(None if charges is None
           else dev(pad1(np.asarray(charges), 0.0, np.float64))),
        molecule=(None if molecules is None
                  else jnp.asarray(pad1(np.asarray(molecules), 0, np.int32))),
        box=jax.tree.map(lambda a: dev(jax.device_get(a)), box),
        mass=dev(masses),
        nlocal=jnp.asarray(np.int32(n)),
        mask=jnp.asarray(groupmask),
        virial=dev(np.zeros(6)),
        ntimestep=jnp.asarray(np.int32(0)),
        aux={},
        units_name=units_name,
        dimension=dimension,
    )
