"""LAMMPS text data-file reader (host-side setup).

Reimplements the sections of the reference's read_data command
(src/read_data.cpp) needed for molecular systems: header counts, box
bounds, Masses, Pair/Bond/Angle/... Coeffs, Atoms (atomic/charge/bond/
molecular/full styles), Velocities, Bonds/Angles/Dihedrals/Impropers.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_HEADER_KEYS = [
    ("atoms", "natoms"), ("ellipsoids", "nellipsoids"),
    ("bonds", "nbonds"), ("angles", "nangles"),
    ("dihedrals", "ndihedrals"), ("impropers", "nimpropers"),
    ("atom types", "natomtypes"), ("bond types", "nbondtypes"),
    ("angle types", "nangletypes"), ("dihedral types", "ndihedraltypes"),
    ("improper types", "nimpropertypes"),
]

_SECTIONS = {
    "Masses", "Atoms", "Velocities", "Bonds", "Angles", "Dihedrals",
    "Impropers", "Pair Coeffs", "PairIJ Coeffs", "Bond Coeffs",
    "Angle Coeffs", "Dihedral Coeffs", "Improper Coeffs",
    "BondBond Coeffs", "BondAngle Coeffs", "MiddleBondTorsion Coeffs",
    "EndBondTorsion Coeffs", "AngleTorsion Coeffs", "AngleAngleTorsion Coeffs",
    "BondBond13 Coeffs", "AngleAngle Coeffs",
}


@dataclasses.dataclass
class DataFile:
    natoms: int = 0
    nellipsoids: int = 0
    nbonds: int = 0
    nangles: int = 0
    ndihedrals: int = 0
    nimpropers: int = 0
    natomtypes: int = 0
    nbondtypes: int = 0
    nangletypes: int = 0
    ndihedraltypes: int = 0
    nimpropertypes: int = 0
    box_lo: np.ndarray = None
    box_hi: np.ndarray = None
    tilt: np.ndarray = None
    masses: np.ndarray = None          # (ntypes+1,)
    x: np.ndarray = None               # (N,3) in tag order (tag 1..N)
    v: np.ndarray = None
    types: np.ndarray = None
    q: np.ndarray = None
    molecule: np.ndarray = None
    image: np.ndarray = None
    radius: np.ndarray = None          # sphere style: per-atom radius
    rmass: np.ndarray = None           # sphere style: per-atom mass
    omega: np.ndarray = None           # sphere style: angular velocity
    bonds: np.ndarray = None           # (nb, 3): type, atom1, atom2 (tags)
    angles: np.ndarray = None          # (na, 4)
    dihedrals: np.ndarray = None       # (nd, 5)
    impropers: np.ndarray = None       # (ni, 5)
    coeffs: dict = dataclasses.field(default_factory=dict)
    # registry-declared fields beyond the named attrs (AtomVec registry)
    fields: dict = dataclasses.field(default_factory=dict)


def read_data(path: str, atom_style: str = "atomic") -> DataFile:
    with open(path) as fh:
        lines = fh.readlines()

    d = DataFile()
    d.box_lo = np.zeros(3)
    d.box_hi = np.ones(3)
    d.tilt = np.zeros(3)

    # --- header --------------------------------------------------------
    i = 1  # skip title line
    while i < len(lines):
        line = lines[i].split("#", 1)[0].strip()
        line = " ".join(line.split())   # tabs/multi-space -> single space
        if not line:
            i += 1
            continue
        matched = False
        for key, attr in _HEADER_KEYS:
            if line.endswith(" " + key) or line == key:
                setattr(d, attr, int(line.split()[0]))
                matched = True
                break
        if matched:
            i += 1
            continue
        toks = line.split()
        if len(toks) >= 4 and toks[-2:] == ["xlo", "xhi"]:
            d.box_lo[0], d.box_hi[0] = float(toks[0]), float(toks[1])
        elif len(toks) >= 4 and toks[-2:] == ["ylo", "yhi"]:
            d.box_lo[1], d.box_hi[1] = float(toks[0]), float(toks[1])
        elif len(toks) >= 4 and toks[-2:] == ["zlo", "zhi"]:
            d.box_lo[2], d.box_hi[2] = float(toks[0]), float(toks[1])
        elif len(toks) >= 6 and toks[3:6] == ["xy", "xz", "yz"]:
            d.tilt = np.array([float(t) for t in toks[:3]])
        else:
            break  # first body section
        i += 1

    # --- body sections -------------------------------------------------
    n = d.natoms
    d.x = np.zeros((n, 3))
    d.v = np.zeros((n, 3))
    d.types = np.zeros(n, dtype=np.int32)
    d.image = np.zeros((n, 3), dtype=np.int32)
    d.masses = np.zeros(d.natomtypes + 1)
    # AtomVec field registry drives per-style columns and sections
    from tpumd.core.atomvec import alloc_fields, get_style
    style = get_style(atom_style)
    fields = alloc_fields(style, n)
    body_sections = set(_SECTIONS) | set(style.sections)

    def parse_rows(start, count, ncols_min):
        rows = []
        j = start
        while len(rows) < count:
            s = lines[j].split("#", 1)[0].strip()
            j += 1
            if not s:
                continue
            rows.append(s.split())
        return rows, j

    while i < len(lines):
        line = lines[i].split("#", 1)[0].strip()
        if not line:
            i += 1
            continue
        section = line
        if section not in body_sections:
            raise ValueError(f"Unknown data-file section: {section!r}")
        i += 1
        if section in style.sections:
            count = getattr(d, f"n{section.lower()}", n)
            rows, i = parse_rows(i, count, 2)
            hook = style.sections[section]
            for r in rows:
                hook(fields, r, int(r[0]) - 1)
            continue
        if section == "Masses":
            rows, i = parse_rows(i, d.natomtypes, 2)
            for r in rows:
                d.masses[int(r[0])] = float(r[1])
        elif section == "Atoms":
            rows, i = parse_rows(i, n, 5)
            for r in rows:
                tag = int(r[0])
                k = tag - 1
                parsed = style.data_atom(r[1:])
                imgcol = parsed.pop("_imgcol") + 1
                d.types[k] = parsed.pop("type")
                d.x[k] = parsed.pop("x")
                for name, val in parsed.items():
                    fields[name][k] = val
                if len(r) >= imgcol + 3:
                    d.image[k] = [int(r[imgcol]), int(r[imgcol + 1]),
                                  int(r[imgcol + 2])]
        elif section == "Velocities":
            rows, i = parse_rows(i, n, 4)
            for r in rows:
                k = int(r[0]) - 1
                d.v[k] = [float(r[1]), float(r[2]), float(r[3])]
                if style.data_vel is not None and len(r) > 4:
                    for name, val in style.data_vel(r[4:]).items():
                        fields[name][k] = val
        elif section in ("Bonds", "Angles", "Dihedrals", "Impropers"):
            count = {"Bonds": d.nbonds, "Angles": d.nangles,
                     "Dihedrals": d.ndihedrals, "Impropers": d.nimpropers}[section]
            width = {"Bonds": 3, "Angles": 4, "Dihedrals": 5, "Impropers": 5}[section]
            rows, i = parse_rows(i, count, width + 1)
            arr = np.zeros((count, width), dtype=np.int64)
            for r in rows:
                arr[int(r[0]) - 1] = [int(t) for t in r[1:width + 1]]
            setattr(d, section.lower(), arr)
        else:  # coeff sections stored raw for styles to consume
            counts = {
                "Pair Coeffs": d.natomtypes, "Bond Coeffs": d.nbondtypes,
                "Angle Coeffs": d.nangletypes,
                "Dihedral Coeffs": d.ndihedraltypes,
                "Improper Coeffs": d.nimpropertypes,
                "PairIJ Coeffs": d.natomtypes * (d.natomtypes + 1) // 2,
                "BondBond Coeffs": d.nangletypes,
                "BondAngle Coeffs": d.nangletypes,
                "MiddleBondTorsion Coeffs": d.ndihedraltypes,
                "EndBondTorsion Coeffs": d.ndihedraltypes,
                "AngleTorsion Coeffs": d.ndihedraltypes,
                "AngleAngleTorsion Coeffs": d.ndihedraltypes,
                "BondBond13 Coeffs": d.ndihedraltypes,
                "AngleAngle Coeffs": d.nimpropertypes,
            }
            rows, i = parse_rows(i, counts[section], 2)
            d.coeffs[section] = rows

    if style.post is not None:
        style.post(fields)
    # named DataFile attrs keep their legacy spots; the rest (ellipsoid
    # shape/quat/angmom, plugin fields) ride the generic dict
    for name in ("q", "molecule", "radius", "rmass", "omega"):
        if name in fields:
            setattr(d, name, fields.pop(name))
    d.fields = fields
    return d


def build_special(nlocal: int, bonds: np.ndarray,
                  angles=None, dihedrals=None):
    """1-2/1-3/1-4 special-neighbor lists from the bond topology.

    Serial equivalent of the reference's rendezvous construction
    (src/special.cpp:57-125): onetwo from bonds (both directions), onethree
    = two hops, onefour = three hops, with LAMMPS's dedup rule (a pair keeps
    its *closest* classification).  Returns (special_tags (N, S) int32
    0-padded, special_codes (N, S) with 1/2/3).
    """
    adj = [[] for _ in range(nlocal + 1)]
    for t, a, b in bonds:
        adj[a].append(b)
        adj[b].append(a)

    tags_list = []
    codes_list = []
    maxs = 1
    for i in range(1, nlocal + 1):
        onetwo = list(dict.fromkeys(adj[i]))
        s12 = set(onetwo)
        onethree = []
        for j in onetwo:
            for k in adj[j]:
                if k != i and k not in s12:
                    onethree.append(k)
        onethree = list(dict.fromkeys(onethree))
        s13 = set(onethree)
        onefour = []
        for j in onethree:
            for k in adj[j]:
                if k != i and k not in s12 and k not in s13:
                    onefour.append(k)
        onefour = list(dict.fromkeys(onefour))
        t = onetwo + onethree + onefour
        c = [1] * len(onetwo) + [2] * len(onethree) + [3] * len(onefour)
        tags_list.append(t)
        codes_list.append(c)
        maxs = max(maxs, len(t))

    tags = np.zeros((nlocal, maxs), dtype=np.int32)
    codes = np.zeros((nlocal, maxs), dtype=np.int32)
    for i, (t, c) in enumerate(zip(tags_list, codes_list)):
        tags[i, :len(t)] = t
        codes[i, :len(c)] = c
    return tags, codes
