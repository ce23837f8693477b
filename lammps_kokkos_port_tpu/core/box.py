"""Simulation box: orthogonal + triclinic, PBC, coordinate transforms.

TPU-native equivalent of the reference's Domain box machinery
(ref: src/domain.h:25-120, src/domain.cpp — boxlo/boxhi, tilt xy/xz/yz,
h/h_inv matrices, x2lamda/lamda2x, pbc remap, minimum image).

The Box is a small JAX pytree so it can live inside the jit-compiled step and
change under NPT (the barostat rescales it every half-step). Periodicity flags
are static metadata: they select compiled code paths, exactly as the
reference's `xperiodic/yperiodic/zperiodic` select branches at run time.

LAMMPS triclinic convention (upper-triangular cell matrix, column vectors):
    a = (xprd, 0, 0); b = (xy, yprd, 0); c = (xz, yz, zprd)
    x = lo + H @ lamda,  H = [[xprd, xy, xz], [0, yprd, yz], [0, 0, zprd]]
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lo", "hi", "tilt"],
    meta_fields=["periodic", "triclinic"],
)
@dataclasses.dataclass(frozen=True)
class Box:
    """Simulation cell. `tilt` = (xy, xz, yz); zero for orthogonal boxes.

    `triclinic` is static metadata selecting the compiled code path, mirroring
    the reference's `domain->triclinic` flag (set once at `create_box` time).
    """

    lo: Array  # (3,)
    hi: Array  # (3,)
    tilt: Array  # (3,) = (xy, xz, yz)
    periodic: tuple[bool, bool, bool] = (True, True, True)
    triclinic: bool = False

    @staticmethod
    def create(lo, hi, tilt=None, periodic=(True, True, True), dtype=None) -> "Box":
        import numpy as np

        lo = jnp.asarray(lo, dtype=dtype)
        hi = jnp.asarray(hi, dtype=dtype)
        if tilt is None:
            tric = False
            tilt = jnp.zeros(3, dtype=lo.dtype)
        else:
            tric = bool(np.any(np.asarray(tilt) != 0.0))
            tilt = jnp.asarray(tilt, dtype=lo.dtype)
        return Box(
            lo=lo, hi=hi, tilt=tilt,
            periodic=tuple(bool(p) for p in periodic),
            triclinic=tric,
        )

    @property
    def dtype(self):
        return self.lo.dtype

    @property
    def prd(self) -> Array:
        """Edge lengths (xprd, yprd, zprd)."""
        return self.hi - self.lo

    @property
    def h(self) -> Array:
        """Upper-triangular cell matrix H (3,3)."""
        p = self.prd
        xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
        z = jnp.zeros((), dtype=p.dtype)
        return jnp.stack([
            jnp.stack([p[0], xy, xz]),
            jnp.stack([z, p[1], yz]),
            jnp.stack([z, z, p[2]]),
        ])

    @property
    def h_inv(self) -> Array:
        """Inverse cell matrix (closed form for upper-triangular H).

        Matches the reference's h_inv entries (src/domain.cpp set_global_box).
        """
        p = self.prd
        xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
        ix = 1.0 / p[0]
        iy = 1.0 / p[1]
        iz = 1.0 / p[2]
        z = jnp.zeros((), dtype=p.dtype)
        hixy = -xy * ix * iy
        hixz = (xy * yz - p[1] * xz) * ix * iy * iz
        hiyz = -yz * iy * iz
        return jnp.stack([
            jnp.stack([ix, hixy, hixz]),
            jnp.stack([z, iy, hiyz]),
            jnp.stack([z, z, iz]),
        ])

    @property
    def volume(self) -> Array:
        p = self.prd
        return p[0] * p[1] * p[2]

    @property
    def is_triclinic(self) -> bool:
        return self.triclinic

    # -- coordinate transforms (ref: src/domain.cpp x2lamda/lamda2x) --------

    def to_lamda(self, x: Array) -> Array:
        """Box coords -> fractional (lamda) coords in [0,1) for wrapped atoms."""
        d = x - self.lo
        hinv = self.h_inv
        # manual triangular solve (cheaper + matches reference arithmetic)
        lz = d[..., 2] * hinv[2, 2]
        ly = d[..., 1] * hinv[1, 1] + d[..., 2] * hinv[1, 2]
        lx = d[..., 0] * hinv[0, 0] + d[..., 1] * hinv[0, 1] + d[..., 2] * hinv[0, 2]
        return jnp.stack([lx, ly, lz], axis=-1)

    def to_box(self, lamda: Array) -> Array:
        """Fractional coords -> box coords."""
        h = self.h
        x = lamda[..., 0] * h[0, 0] + lamda[..., 1] * h[0, 1] + lamda[..., 2] * h[0, 2]
        y = lamda[..., 1] * h[1, 1] + lamda[..., 2] * h[1, 2]
        z = lamda[..., 2] * h[2, 2]
        return jnp.stack([x, y, z], axis=-1) + self.lo

    # -- PBC ----------------------------------------------------------------

    def _periodic_mask(self, dtype) -> Array:
        return jnp.asarray([float(p) for p in self.periodic], dtype=dtype)

    def wrap(self, x: Array, image: Array | None = None):
        """Remap atoms into the primary cell, updating image flags.

        Equivalent of Domain::pbc (ref: src/domain.cpp) but vectorized: shift
        by an integer number of cell vectors so lamda lands in [0,1).
        Non-periodic dims are left untouched. Returns (x_wrapped, image).
        """
        lamda = self.to_lamda(x)
        shift = jnp.floor(lamda)
        pmask = self._periodic_mask(lamda.dtype)
        shift = shift * pmask
        new_lamda = lamda - shift
        xw = self.to_box(new_lamda)
        if image is not None:
            image = image + shift.astype(image.dtype)
        return xw, image

    def unwrap(self, x: Array, image: Array) -> Array:
        """Apply image flags to produce unwrapped coordinates (for MSD etc.)."""
        img = image.astype(x.dtype)
        h = self.h
        dx = img[..., 0] * h[0, 0] + img[..., 1] * h[0, 1] + img[..., 2] * h[0, 2]
        dy = img[..., 1] * h[1, 1] + img[..., 2] * h[1, 2]
        dz = img[..., 2] * h[2, 2]
        return x + jnp.stack([dx, dy, dz], axis=-1)

    def min_image(self, dx: Array) -> Array:
        """Minimum-image displacement (ref: Domain::minimum_image).

        Valid when the interaction cutoff is below half the smallest box
        height. For triclinic cells the correction is applied in fractional
        space, which is exact for standard LAMMPS tilt limits (|tilt| <= 1/2).
        """
        pmask = self._periodic_mask(dx.dtype)
        if not self.triclinic:
            p = self.prd
            return dx - p * pmask * jnp.round(dx / p)
        hinv = self.h_inv
        lz = dx[..., 2] * hinv[2, 2]
        ly = dx[..., 1] * hinv[1, 1] + dx[..., 2] * hinv[1, 2]
        lx = dx[..., 0] * hinv[0, 0] + dx[..., 1] * hinv[0, 1] + dx[..., 2] * hinv[0, 2]
        l = jnp.stack([lx, ly, lz], axis=-1)
        n = jnp.round(l) * pmask
        h = self.h
        cx = n[..., 0] * h[0, 0] + n[..., 1] * h[0, 1] + n[..., 2] * h[0, 2]
        cy = n[..., 1] * h[1, 1] + n[..., 2] * h[1, 2]
        cz = n[..., 2] * h[2, 2]
        return dx - jnp.stack([cx, cy, cz], axis=-1)
