"""AtomVec field registry — per-atom-style field declarations.

The reference declares each atom style's per-atom storage as string
lists that generic machinery consumes (grow/copy/comm/restart/data-file,
src/atom_vec.h:62-80, e.g. atom_vec_ellipsoid.cpp:54-65
``fields_grow = {"rmass", "angmom", "torque", "ellipsoid"}``).  The TPU
translation: an atom style is DATA — a tuple of Field declarations plus
two small column-layout hooks — and everything else (state construction,
slot permutation, padding, restart, data-file read/write) iterates the
declarations.  New styles (including plugin styles) register here
instead of editing readers.

Storage: fields whose names match MDState attributes (q, molecule,
radius, rmass, omega, torque) land there; any other declared field lands
in ``MDState.extras`` — a dict pytree that permutes/pads/restarts with
the atoms automatically (state.map_per_atom covers it).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Field:
    """One per-atom array: (N,) when width == 1, else (N, width)."""

    name: str
    kind: str = "float"          # "float" | "int"
    width: int = 1
    default: float = 0.0


@dataclasses.dataclass(frozen=True)
class AtomStyle:
    """Field set + data-file column layout for one atom style.

    data_atom(cols) consumes the per-atom tokens of an Atoms line AFTER
    the id column and returns {field name: value} including "type"/"x";
    data_vel(cols) consumes tokens after the Velocities id + vx vy vz.
    sections maps a dedicated body section name (e.g. "Ellipsoids") to a
    per-row hook(fields_dict, row_tokens, k).
    """

    name: str
    fields: tuple = ()
    molecular: bool = False
    data_atom: callable = None
    data_vel: callable = None
    sections: dict = dataclasses.field(default_factory=dict)
    post: callable = None        # post-read fixup(fields_dict)


def _simple_layout(has_mol=False, has_q=False):
    def parse(r):
        out = {}
        col = 0
        if has_mol:
            out["molecule"] = int(r[col]); col += 1
        out["type"] = int(r[col]); col += 1
        if has_q:
            out["q"] = float(r[col]); col += 1
        out["x"] = [float(r[col]), float(r[col + 1]), float(r[col + 2])]
        out["_imgcol"] = col + 3
        return out
    return parse


def _sphere_data_atom(r):
    # id type diameter density x y z (atom_vec_sphere.cpp data_atom):
    # rmass = pi/6 rho d^3, or plain mass when d == 0
    out = {"type": int(r[0])}
    diam, dens = float(r[1]), float(r[2])
    out["radius"] = 0.5 * diam
    out["rmass"] = np.pi / 6.0 * dens * diam ** 3 if diam > 0 else dens
    out["x"] = [float(r[3]), float(r[4]), float(r[5])]
    out["_imgcol"] = 6
    return out


def _sphere_data_vel(r):
    return {"omega": [float(r[0]), float(r[1]), float(r[2])]} if r else {}


def _ellipsoid_data_atom(r):
    # id type ellipsoidflag density x y z (atom_vec_ellipsoid.cpp:65);
    # the Ellipsoids bonus section converts density -> mass
    out = {"type": int(r[0]),
           "ellipsoid": int(r[1]),
           "rmass": float(r[2]),
           "x": [float(r[3]), float(r[4]), float(r[5])],
           "_imgcol": 6}
    return out


def _ellipsoid_data_vel(r):
    return {"angmom": [float(r[0]), float(r[1]), float(r[2])]} if r else {}


def _ellipsoid_bonus(fields, r, k):
    # id shapex shapey shapez quatw quatx quaty quatz
    # (AtomVecEllipsoid::data_atom_bonus, atom_vec_ellipsoid.cpp:386-418)
    shape = [0.5 * float(r[1]), 0.5 * float(r[2]), 0.5 * float(r[3])]
    quat = np.asarray([float(r[4]), float(r[5]), float(r[6]),
                       float(r[7])])
    quat = quat / np.sqrt((quat * quat).sum())
    fields["shape"][k] = shape
    fields["quat"][k] = quat
    # previously stored density in rmass (:408-410)
    fields["rmass"][k] *= (4.0 * np.pi / 3.0
                           * shape[0] * shape[1] * shape[2])


STYLES: dict[str, AtomStyle] = {}


def register_style(style: AtomStyle):
    """Register (or override) an atom style — the plugin entry point."""
    STYLES[style.name] = style


def get_style(name: str) -> AtomStyle:
    if name not in STYLES:
        raise ValueError(f"unknown atom style {name!r} (registered: "
                         f"{sorted(STYLES)})")
    return STYLES[name]


register_style(AtomStyle("atomic", data_atom=_simple_layout()))
register_style(AtomStyle("charge", fields=(Field("q"),),
                         data_atom=_simple_layout(has_q=True)))
for _nm in ("bond", "angle", "molecular"):
    register_style(AtomStyle(_nm, fields=(Field("molecule", "int"),),
                             molecular=True,
                             data_atom=_simple_layout(has_mol=True)))
register_style(AtomStyle("full",
                         fields=(Field("molecule", "int"), Field("q")),
                         molecular=True,
                         data_atom=_simple_layout(has_mol=True,
                                                  has_q=True)))
register_style(AtomStyle(
    "sphere",
    fields=(Field("radius"), Field("rmass"), Field("omega", width=3),
            Field("torque", width=3)),
    data_atom=_sphere_data_atom, data_vel=_sphere_data_vel))
register_style(AtomStyle(
    "ellipsoid",
    fields=(Field("rmass"), Field("ellipsoid", "int"),
            Field("shape", width=3), Field("quat", width=4),
            Field("angmom", width=3), Field("torque", width=3)),
    data_atom=_ellipsoid_data_atom, data_vel=_ellipsoid_data_vel,
    sections={"Ellipsoids": _ellipsoid_bonus}))


def alloc_fields(style: AtomStyle, n: int) -> dict:
    """Host-side zero arrays for every declared field."""
    out = {}
    for f in style.fields:
        dt = np.int32 if f.kind == "int" else np.float64
        shape = (n,) if f.width == 1 else (n, f.width)
        out[f.name] = np.full(shape, f.default, dtype=dt)
    if "quat" in out:
        out["quat"][:, 0] = 1.0
    return out
