"""Style registries: name -> constructor.

The TPU analog of the reference's generated style_*.h factory maps
(src/force.cpp:87-93, 237-254).  Styles register themselves at import.
"""

from __future__ import annotations

_PAIR_STYLES = {}
_BOND_STYLES = {}
_ANGLE_STYLES = {}
_DIHEDRAL_STYLES = {}
_IMPROPER_STYLES = {}


def register_pair(name):
    def deco(cls):
        _PAIR_STYLES[name] = cls
        return cls
    return deco


def register_bonded(kind: str, name: str):
    table = {"bond": _BOND_STYLES, "angle": _ANGLE_STYLES,
             "dihedral": _DIHEDRAL_STYLES, "improper": _IMPROPER_STYLES}[kind]

    def deco(cls):
        table[name] = cls
        return cls
    return deco


def create_pair_style(name: str, ntypes: int, args, units=None):
    _ensure_imports()
    if name not in _PAIR_STYLES:
        raise ValueError(f"Unknown pair style {name!r}")
    style = _PAIR_STYLES[name](ntypes)
    style.style_name = name          # queried by the C API neighlist find
    if units is not None:
        style.units = units
    style.settings(*[_num(a) for a in args])
    return style


def create_bonded_style(kind: str, name: str, ntypes: int, args=()):
    _ensure_imports()
    table = {"bond": _BOND_STYLES, "angle": _ANGLE_STYLES,
             "dihedral": _DIHEDRAL_STYLES, "improper": _IMPROPER_STYLES}[kind]
    if name not in table:
        raise ValueError(f"Unknown {kind} style {name!r}")
    if name == "hybrid":
        return table[name](ntypes, sub_names=args)
    style = table[name](ntypes)
    if args and hasattr(style, "settings"):
        style.settings(*[_num(a) for a in args])
    return style


def _num(tok):
    try:
        return float(tok)
    except (TypeError, ValueError):
        return tok


def _ensure_imports():
    # import style modules for their registration side effects
    import tpumd.models.pair_lj_cut  # noqa: F401
    import tpumd.models.pair_eam  # noqa: F401
    import tpumd.models.pair_charmm  # noqa: F401
    import tpumd.models.bonded  # noqa: F401
    import tpumd.models.pair_misc  # noqa: F401
    import tpumd.models.pair_manybody  # noqa: F401
    import tpumd.models.pair_adp  # noqa: F401
    import tpumd.models.pair_eim  # noqa: F401
    import tpumd.models.pair_meam  # noqa: F401
    import tpumd.models.pair_hybrid  # noqa: F401
    import tpumd.models.pair_gran  # noqa: F401
    import tpumd.models.pair_dpd  # noqa: F401
    import tpumd.models.pair_table  # noqa: F401
    import tpumd.models.pair_breadth2  # noqa: F401
    import tpumd.models.pair_tip4p  # noqa: F401
    import tpumd.models.kspace_msm  # noqa: F401 (lj/cut/coul/msm, lj/long)
    import tpumd.models.bonded_class2  # noqa: F401
    import tpumd.models.bonded_table  # noqa: F401
    import tpumd.models.bonded_extra  # noqa: F401
