"""Molecular topology: bonds/angles/dihedrals/impropers + special bonds.

TPU-native equivalent of the reference's per-atom topology arrays
(ref: src/atom.h:96-115), the NTopo interaction lists rebuilt each
reneighbor (ref: src/ntopo_bond_all.cpp:38-82), and the 1-2/1-3/1-4
special-neighbor machinery (ref: src/special.cpp:57-270).

Design: topology is STATIC per run (no bond breaking yet): interaction
lists are fixed-shape padded index arrays built once on the host from tags.
On a single chip atoms never reorder, so tag->local-index is resolved once
at setup; the multi-chip path re-resolves after migration (the analog of
NTopo rebuilds). Padded rows have type 0 and index `cap` (masked out).

Special bonds: per-atom fixed-width [cap, ms] list of 1-2/1-3/1-4 partner
local indices with a parallel class array (1/2/3). The neighbor build uses
it to exclude (weight 0) or mask (fractional weight) pairs — the analog of
the 2-bit SBBITS packing in reference neighbor lists
(ref: src/npair_half_bin_newton.cpp:36-160 `j ^ (which << SBBITS)`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["bonds", "angles", "dihedrals", "impropers"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Topology:
    """Padded interaction lists, LOCAL atom indices (sentinel = capacity).

    bonds:     [NBp, 3]  (type, i, j)         type 0 = padding
    angles:    [NAp, 4]  (type, i, j, k)      j = center
    dihedrals: [NDp, 5]  (type, i, j, k, l)
    impropers: [NIp, 5]  (type, i, j, k, l)
    """

    bonds: Array
    angles: Array
    dihedrals: Array
    impropers: Array

    @staticmethod
    def empty() -> "Topology":
        z = lambda w: jnp.zeros((0, w), dtype=jnp.int32)
        return Topology(bonds=z(3), angles=z(4), dihedrals=z(5), impropers=z(5))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "cls"],
    meta_fields=["weights_lj", "weights_coul", "mode"],
)
@dataclasses.dataclass(frozen=True)
class SpecialBonds:
    """Per-atom special neighbor table.

    idx: [cap, ms] int32 local indices of 1-2/1-3/1-4 partners (cap=empty)
    cls: [cap, ms] int32 class per slot: 1 (1-2), 2 (1-3), 3 (1-4), 0 empty
    weights_lj / weights_coul: (w0=1, w12, w13, w14) pair weights
      (ref: force->special_lj/special_coul; input `special_bonds`)
    mode: 'exclude' drops weight-0 pairs from neighbor lists;
          'mask' keeps them with a recorded class (needed for kspace, which
          requires subtracting the excluded real-space term —
          ref: Neighbor::special_flag semantics, src/neighbor.cpp)
    """

    idx: Array
    cls: Array
    weights_lj: tuple = (1.0, 0.0, 0.0, 0.0)
    weights_coul: tuple = (1.0, 0.0, 0.0, 0.0)
    mode: str = "exclude"

    @property
    def ms(self) -> int:
        return self.idx.shape[1]


def build_special(
    natoms: int,
    cap: int,
    bonds_ij: np.ndarray,  # [NB, 2] 0-based local indices
    weights_lj=(0.0, 0.0, 0.0),
    weights_coul=(0.0, 0.0, 0.0),
    mode: str = "exclude",
    pad_multiple: int = 2,
) -> SpecialBonds:
    """Walk the bond graph to 1-2/1-3/1-4 lists (ref: Special::build).

    weights are (w12, w13, w14) as in the `special_bonds` command.
    """
    adj: list[set[int]] = [set() for _ in range(natoms)]
    for i, j in bonds_ij:
        adj[int(i)].add(int(j))
        adj[int(j)].add(int(i))

    one2 = [sorted(a) for a in adj]
    one3 = []
    for i in range(natoms):
        s = set()
        for j in adj[i]:
            s.update(adj[j])
        s.discard(i)
        s -= set(one2[i])
        one3.append(sorted(s))
    one4 = []
    for i in range(natoms):
        s = set()
        for k in one3[i]:
            s.update(adj[k])
        s.discard(i)
        s -= set(one2[i])
        s -= set(one3[i])
        one4.append(sorted(s))

    ms = max((len(a) + len(b) + len(c)
              for a, b, c in zip(one2, one3, one4)), default=1)
    ms = max(ms, 1)
    ms = ((ms + pad_multiple - 1) // pad_multiple) * pad_multiple

    idx = np.full((cap, ms), cap, dtype=np.int32)
    cls = np.zeros((cap, ms), dtype=np.int32)
    for i in range(natoms):
        row = one2[i] + one3[i] + one4[i]
        cl = [1] * len(one2[i]) + [2] * len(one3[i]) + [3] * len(one4[i])
        idx[i, : len(row)] = row
        cls[i, : len(row)] = cl

    return SpecialBonds(
        idx=jnp.asarray(idx),
        cls=jnp.asarray(cls),
        weights_lj=(1.0,) + tuple(float(w) for w in weights_lj),
        weights_coul=(1.0,) + tuple(float(w) for w in weights_coul),
        mode=mode,
    )


def pad_topology(
    cap: int,
    bonds: np.ndarray | None = None,  # [NB, 3] (type, i, j) local 0-based
    angles: np.ndarray | None = None,
    dihedrals: np.ndarray | None = None,
    impropers: np.ndarray | None = None,
    pad_multiple: int = 8,
) -> Topology:
    """Pad interaction lists to fixed shapes (padding: type 0, atoms=cap)."""

    def pad(arr, width):
        if arr is None or len(arr) == 0:
            return jnp.zeros((0, width), dtype=jnp.int32)
        arr = np.asarray(arr, dtype=np.int32)
        n = len(arr)
        npad = ((n + pad_multiple - 1) // pad_multiple) * pad_multiple
        out = np.zeros((npad, width), dtype=np.int32)
        out[:, 1:] = cap
        out[:n] = arr
        return jnp.asarray(out)

    return Topology(
        bonds=pad(bonds, 3),
        angles=pad(angles, 4),
        dihedrals=pad(dihedrals, 5),
        impropers=pad(impropers, 5),
    )
