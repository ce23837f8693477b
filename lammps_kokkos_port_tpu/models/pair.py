"""Generic pair-style compute engine over the padded neighbor matrix.

TPU-native analog of the reference's Kokkos pair functor framework
(ref: src/KOKKOS/pair_kokkos.h PairComputeFunctor): a pair style supplies a
per-pair closure (fpair, evdwl) over (r^2, type_i, type_j); this module owns
the gather / mask / reduce skeleton. We use FULL neighbor lists with Newton
off — each atom accumulates its own force, no scatter — which is the
reference's preferred GPU mode (ref: src/KOKKOS/kokkos.cpp:260-275) and the
natural race-free TPU mapping.

Energy and virial are tallied per-pair with a 0.5 weight (each pair visited
twice), matching the FULL-list tally convention
(ref: src/KOKKOS/pair_kokkos.h ev_tally FULL path). The virial is the
Voigt 6-vector (xx, yy, zz, xy, xz, yz) as in src/pair.cpp virial tally.
"""

from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp

from ..core.state import State
from ..ops.neighbor import NeighborList

Array = jax.Array


class PairStyle(Protocol):
    """Interface every pair style implements (analog of the Pair virtuals,
    ref: src/pair.h:155-229).

    Styles with simple per-pair closed forms implement `pair_terms` and get
    the shared gather/mask/reduce skeleton via `compute` below; many-body
    styles (EAM, Tersoff, SNAP) implement their own `compute` with the same
    signature.
    """

    ntypes: int

    def cutsq_table(self) -> Array:
        """[ntypes+1, ntypes+1] squared force cutoffs (0 row/col unused)."""
        ...

    def max_cutoff(self) -> float:
        """Largest force cutoff (host-side; feeds the neighbor skin)."""
        ...

    def compute(self, state, nl, eflag: bool, vflag: bool):
        """Returns (f [cap,3], evdwl scalar | None, virial [6] | None)."""
        ...

    def pair_terms(self, r2: Array, ti: Array, tj: Array, eflag: bool):
        """Per-pair force/energy: returns (fpair, evdwl) with fpair = -dE/dr / r
        so that f_i += fpair * dx. evdwl may be None when eflag is False."""
        ...


def gather_pairs(state: State, nl: NeighborList):
    """Shared neighbor gather: returns (j, jc, pair_valid, dx, r2).

    When the list carries explicit image-shift codes (small-box mode, see
    ops/neighbor.py), displacements use the recorded image instead of the
    minimum-image convention — the fixed-shape analog of ghost atoms.
    """
    cap = state.capacity
    j = nl.idx
    jc = jnp.clip(j, 0, cap - 1)
    pair_valid = j < cap
    xi = state.x[:, None, :]
    xj = state.x[jc]
    if nl.shift is not None:
        from ..ops.neighbor import shift_offsets

        offs = jnp.asarray(
            shift_offsets(nl.params.images), dtype=state.dtype
        )
        vecs = offs @ state.box.h.T  # [nsh, 3]
        dx = xi - (xj + vecs[nl.shift])
    else:
        dx = state.box.min_image(xi - xj)
    r2 = jnp.sum(dx * dx, axis=-1)
    return j, jc, pair_valid, dx, r2


# [rows, K] pair-tensor budget before the matrix engines switch to
# row-chunked evaluation (each block materializes ~20 intermediates of
# B*K f32 — 4M elements keeps the peak near ~300 MB instead of tens of GB
# at molecular K of ~1-2k; ref problem: bench/in.rhodo at 32k atoms)
_PAIR_ELEMS_LIMIT = 4 * 2 ** 20


def map_row_blocks(cap: int, K: int, block_fn, slice_args, concat_outs=1):
    """Evaluate `block_fn(*row_slices)` over row blocks of the [cap, K]
    pair problem with jax.lax.map, bounding peak memory.

    slice_args: per-row arrays ([cap, ...]) sliced per block (None kept).
    block_fn returns a tuple; the first `concat_outs` entries are per-row
    arrays (concatenated), the rest scalars/fixed-size (summed).
    Rows are padded up to a block multiple; callers must already treat
    out-of-range neighbor indices as invalid (they are, via j >= cap).
    """
    if cap * K <= _PAIR_ELEMS_LIMIT:
        return block_fn(*slice_args)
    B = max(8, _PAIR_ELEMS_LIMIT // max(K, 1) // 8 * 8)
    nb = -(-cap // B)
    pad = nb * B - cap

    def pad_rows(a):
        if a is None:
            return None
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=0)

    padded = [pad_rows(a) for a in slice_args]

    def one(b):
        sl = [None if a is None
              else jax.lax.dynamic_slice_in_dim(a, b * B, B, axis=0)
              for a in padded]
        return block_fn(*sl)

    outs = jax.lax.map(one, jnp.arange(nb))
    res = []
    for i, o in enumerate(outs):
        if i < concat_outs:
            o = o.reshape((nb * B,) + o.shape[2:])[:cap]
        elif o is not None:
            o = jnp.sum(o, axis=0)
        res.append(o)
    return tuple(res)


def tally_virial(fpair: Array, dx: Array) -> Array:
    """Voigt virial from per-pair scalar forces (0.5 weight, FULL lists)."""
    w = 0.5 * fpair
    return jnp.stack([
        jnp.sum(w * dx[..., 0] * dx[..., 0]),
        jnp.sum(w * dx[..., 1] * dx[..., 1]),
        jnp.sum(w * dx[..., 2] * dx[..., 2]),
        jnp.sum(w * dx[..., 0] * dx[..., 1]),
        jnp.sum(w * dx[..., 0] * dx[..., 2]),
        jnp.sum(w * dx[..., 1] * dx[..., 2]),
    ])


def compute(
    style: PairStyle,
    state: State,
    nl: NeighborList,
    eflag: bool = False,
    vflag: bool = False,
    special_lj=None,
    special_coul=None,
):
    """Evaluate forces (and optionally energy/virial) for a simple pair style.

    Returns (f [cap,3], evdwl scalar | None, virial [6] | None).
    `special_lj` (4-tuple) weights 1-2/1-3/1-4 pairs via nl.sb, exactly as
    the reference applies `factor_lj = special_lj[sbmask(j)]`
    (ref: src/pair_lj_cut.cpp:69-140).
    """
    cap = state.capacity
    j, jc, pair_valid, dx, r2 = gather_pairs(state, nl)

    if style.ntypes == 1:
        ti = None
        tj = None
        cutsq = style.cutsq_table()[1, 1]
    else:
        ti = state.type[:, None]
        tj = state.type[jc]
        cutsq = style.cutsq_table()[ti, tj]

    valid = pair_valid & (r2 < cutsq)
    r2_safe = jnp.where(valid, r2, jnp.ones((), dtype=r2.dtype))

    fpair, evdwl = style.pair_terms(r2_safe, ti, tj, eflag)
    fpair = jnp.where(valid, fpair, 0.0)

    if nl.sb is not None and special_lj is not None:
        w = jnp.asarray(special_lj, dtype=r2.dtype)[nl.sb]
        fpair = fpair * w
        if eflag and evdwl is not None and not getattr(
                style, "special_scales_force_only", False):
            # a few reference styles scale the force by factor_lj but
            # tally the UNWEIGHTED energy (e.g. lj/smooth/linear:
            # pair_lj_smooth_linear.cpp ev_tally gets raw evdwl)
            evdwl = evdwl * w

    f = jnp.sum(dx * fpair[..., None], axis=1)

    owned = state.owned_mask[:, None]
    pe = None
    if eflag:
        e = jnp.where(valid & owned, evdwl, 0.0)
        pe = 0.5 * jnp.sum(e)

    virial = None
    if vflag:
        virial = tally_virial(jnp.where(owned, fpair, 0.0), dx)

    return f, pe, virial


def mix_epsilon(e1, e2, s1, s2, style: str) -> float:
    """Pair coeff mixing for epsilon (ref: src/pair.cpp:705 mix_energy)."""
    import math

    if style in ("geometric", "arithmetic"):
        return math.sqrt(e1 * e2)
    if style == "sixthpower":
        return (
            2.0 * math.sqrt(e1 * e2) * s1**3 * s2**3 / (s1**6 + s2**6)
        )
    raise ValueError(f"unknown mix style {style!r}")


def mix_sigma(s1, s2, style: str) -> float:
    """Pair coeff mixing for sigma (ref: src/pair.cpp:723 mix_distance)."""
    import math

    if style == "geometric":
        return math.sqrt(s1 * s2)
    if style == "arithmetic":
        return 0.5 * (s1 + s2)
    if style == "sixthpower":
        return (0.5 * (s1**6 + s2**6)) ** (1.0 / 6.0)
    raise ValueError(f"unknown mix style {style!r}")
