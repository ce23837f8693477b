"""Checkpoint / resume: binary restart of the full state pytree.

TPU-native equivalent of the reference's restart files
(ref: src/write_restart.cpp:207-460 — header, box, per-atom payload,
per-fix state; reader src/read_restart.cpp). The payload here is the State
pytree itself (positions/velocities/types/tags/images/charges/box/
thermostat-chain aux/ntimestep), stored as an .npz with a JSON header —
orbax-style checkpointing without the orbax dependency weight.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import Box
from ..core.state import State

MAGIC = "lammps_kokkos_port_tpu restart v1"


def _flatten_aux(aux: dict, prefix="aux."):
    out = {}
    for k, v in aux.items():
        if isinstance(v, dict):
            out.update(_flatten_aux(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(jax.device_get(v))
    return out


def _unflatten_aux(items: dict):
    aux = {}
    for k, v in items.items():
        parts = k.split("/")
        d = aux
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return aux


def write_restart(path: str, sim, script_meta: dict | None = None):
    """script_meta: optional JSON-serializable style/settings blob so the
    `read_restart` COMMAND can restore the full run configuration — the
    analog of the style names + coeffs the reference writes
    (ref: src/write_restart.cpp:207-460 force-style sections)."""
    st = sim.state
    header = {
        "magic": MAGIC,
        "units": st.units_name,
        "dimension": st.dimension,
        "periodic": list(st.box.periodic),
        "triclinic": st.box.triclinic,
        "has_q": st.q is not None,
        "has_molecule": st.molecule is not None,
        "ntimestep": int(jax.device_get(st.ntimestep)),
        "dtype": str(np.dtype(st.dtype)),
        "owned_all": st.owned_all,
        "script_meta": script_meta,
    }
    arrays = {
        "x": st.x, "v": st.v, "f": st.f, "type": st.type, "tag": st.tag,
        "image": st.image, "mass": st.mass, "nlocal": st.nlocal,
        "mask": st.mask, "virial": st.virial,
        "box_lo": st.box.lo, "box_hi": st.box.hi, "box_tilt": st.box.tilt,
    }
    if st.q is not None:
        arrays["q"] = st.q
    if st.molecule is not None:
        arrays["molecule"] = st.molecule
    arrays = {k: np.asarray(jax.device_get(v)) for k, v in arrays.items()}
    arrays.update(_flatten_aux(st.aux))
    # write through a file handle so np.savez cannot append ".npz" — the
    # user's filename is kept verbatim (the reference writes exact names)
    with open(path, "wb") as fh:
        np.savez(fh, __header__=json.dumps(header), **arrays)


def read_restart(path: str, with_meta: bool = False):
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"  # files from older writers
    data = np.load(path, allow_pickle=False)
    header = json.loads(str(data["__header__"]))
    if header["magic"] != MAGIC:
        raise ValueError("not a lammps_kokkos_port_tpu restart file")
    state = _state_from(data, header)
    if with_meta:
        return state, header.get("script_meta")
    return state


def _state_from(data, header) -> State:
    box = Box.create(
        data["box_lo"], data["box_hi"],
        tilt=data["box_tilt"] if header["triclinic"] else None,
        periodic=tuple(header["periodic"]),
        dtype=jnp.dtype(header["dtype"]),
    )
    aux_items = {k[len("aux."):]: data[k] for k in data.files
                 if k.startswith("aux.")}
    return State(
        x=jnp.asarray(data["x"]),
        v=jnp.asarray(data["v"]),
        f=jnp.asarray(data["f"]),
        type=jnp.asarray(data["type"]),
        tag=jnp.asarray(data["tag"]),
        image=jnp.asarray(data["image"]),
        q=jnp.asarray(data["q"]) if header["has_q"] else None,
        molecule=(jnp.asarray(data["molecule"])
                  if header["has_molecule"] else None),
        box=box,
        mass=jnp.asarray(data["mass"]),
        nlocal=jnp.asarray(data["nlocal"]),
        mask=jnp.asarray(data["mask"]),
        virial=jnp.asarray(data["virial"]),
        ntimestep=jnp.asarray(np.int32(header["ntimestep"])),
        aux=_unflatten_aux(aux_items),
        units_name=header["units"],
        dimension=header["dimension"],
        owned_all=bool(header.get("owned_all", False)),
    )
