"""Replicate the reference's local atom ordering for RNG-stream parity.

The reference spatially sorts atoms at EVERY run setup (ref:
src/verlet.cpp:123 `if (atom->sortfreq > 0) atom->sort()`): atoms are
binned into cells of size 0.5*cutneighmax over the subdomain, bins
visited z-major, and within a bin atoms keep their previous relative
order (ref: src/atom.cpp:2246-2345 Atom::sort binning in reverse index
order -> forward linked lists). Stochastic fixes (temp/csld, langevin)
consume per-atom RanMars draws in exactly this local order, so matching
their golden trajectories digit-for-digit requires reproducing the
permutation — the physics doesn't care, the RNG stream does.

Our State keeps atoms in tag order (or cell-sorted order for the sorted
engine); this module just tracks what the REFERENCE's local order would
be, as a host-side tag array threaded through successive sorts.
"""

from __future__ import annotations

import numpy as np

# default neighbor skin per unit system (ref: src/update.cpp set_units)
_DEFAULT_SKIN = {
    "lj": 0.3, "real": 2.0, "metal": 2.0, "si": 0.001, "cgs": 0.1,
    "electron": 2.0, "micro": 0.1, "nano": 0.1,
}


def default_skin(units_name: str) -> float:
    return _DEFAULT_SKIN.get(units_name, 2.0)


def ref_sort_order(order_tags: np.ndarray, x_by_tag: np.ndarray,
                   box_lo: np.ndarray, box_hi: np.ndarray,
                   binsize: float) -> np.ndarray:
    """One Atom::sort() pass: stable re-sort of `order_tags` (tags in the
    current reference local order) by spatial bin of the wrapped
    positions. `x_by_tag[t-1]` is atom t's position. Returns the new tag
    order. (ref: src/atom.cpp:2246 Atom::sort, :2352 setup_sort_bins)"""
    lo = np.asarray(box_lo, dtype=float)
    hi = np.asarray(box_hi, dtype=float)
    span = hi - lo
    if binsize <= 0.0:
        return order_tags
    nbin = np.maximum((span / binsize).astype(int), 1)
    if int(np.prod(nbin)) == 1:
        return order_tags
    bininv = nbin / span
    x = x_by_tag[order_tags - 1]
    # domain->pbc() wraps atoms into the box before setup's sort
    xw = lo + np.mod(x - lo, span)
    idx = np.clip(((xw - lo) * bininv).astype(int), 0, nbin - 1)
    ibin = (idx[:, 2] * nbin[1] + idx[:, 1]) * nbin[0] + idx[:, 0]
    # reverse-order binning + forward list traversal == stable by bin
    return order_tags[np.argsort(ibin, kind="stable")]
