"""Tabulated bonded styles: bond_style table, angle_style table
(reference: src/MOLECULE/bond_table.cpp, angle_table.cpp).

Same resampling pipeline as the reference: the file points are splined
(NR natural-spline with force-derived end slopes), resampled to
`tablength` uniform bins (in r for bonds, in [0, pi] for angles), then
interpolated per evaluation as `linear` (value + fraction * delta) or
`spline` (cubic with precomputed second derivatives).  On TPU both
lookups are two table gathers + fused arithmetic — the resampled
uniform grid turns the reference's per-row searchsorted into a single
multiply."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpumd.models.bonded import AngleStyle, BondStyle, _mi, register_bonded
from tpumd.models.pair_table import _spline, _splint

DEG2RAD = np.pi / 180.0


def _read_bonded_table(path, keyword):
    """One section of a bond/angle table file: header line
    `N n [FP fplo fphi] [EQ eq]` then `index x energy force` rows
    (BondTable::read_table/param_extract, bond_table.cpp:306-500)."""
    lines = open(path).read().splitlines()
    i = 0
    while i < len(lines):
        if lines[i].split("#")[0].strip() == keyword:
            break
        i += 1
    else:
        raise ValueError(f"keyword {keyword!r} not found in {path}")
    params = lines[i + 1].split()
    n = int(params[params.index("N") + 1])
    fpflag, fplo, fphi = False, 0.0, 0.0
    eq = None
    if "FP" in params:
        k = params.index("FP")
        fpflag, fplo, fphi = True, float(params[k + 1]), float(params[k + 2])
    if "EQ" in params:
        eq = float(params[params.index("EQ") + 1])
    i += 2
    rows = []
    while len(rows) < n:
        t = lines[i].split()
        if t:
            rows.append([float(t[1]), float(t[2]), float(t[3])])
        i += 1
    arr = np.array(rows)
    return dict(x=arr[:, 0], e=arr[:, 1], f=arr[:, 2],
                fpflag=fpflag, fplo=fplo, fphi=fphi, eq=eq)


class _TabulatedMixin:
    """Shared resample + lookup (bond_table.cpp spline_table/
    compute_table/uf_lookup, mirrored by angle_table.cpp)."""

    def _resample(self, tb, lo, hi):
        n = self.tablength
        x, e, f = tb["x"], tb["e"], tb["f"]
        e2f = _spline(x, e, -f[0], -f[-1])
        if tb["fpflag"]:
            fplo, fphi = tb["fplo"], tb["fphi"]
        else:
            fplo = (f[1] - f[0]) / (x[1] - x[0])
            fphi = (f[-1] - f[-2]) / (x[-1] - x[-2])
        f2f = _spline(x, f, fplo, fphi)
        delta = (hi - lo) / (n - 1)
        xs = lo + np.arange(n) * delta
        es = _splint(x, e, e2f, xs)
        fs = _splint(x, f, f2f, xs)
        de = np.empty(n)
        df = np.empty(n)
        de[:-1] = es[1:] - es[:-1]
        df[:-1] = fs[1:] - fs[:-1]
        de[-1] = 2.0 * de[-2] - de[-3]
        df[-1] = 2.0 * df[-2] - df[-3]
        e2 = _spline(xs, es, -fs[0], -fs[-2])
        f2 = _spline(xs, fs, fplo, fphi)
        return dict(lo=lo, hi=hi, delta=delta, x=xs, e=es, f=fs,
                    de=de, df=df, e2=e2, f2=f2)

    def _pack(self, per_type):
        """Stack per-type resampled tables into (ntypes+1, n) arrays."""
        n = self.tablength
        keys = ("e", "f", "de", "df", "e2", "f2", "x")
        self._tabs = {k: np.zeros((self.ntypes + 1, n)) for k in keys}
        self._lo = np.zeros(self.ntypes + 1)
        self._invdelta = np.ones(self.ntypes + 1)
        self._deltasq6 = np.zeros(self.ntypes + 1)
        for t, tab in per_type.items():
            for k in keys:
                self._tabs[k][t] = tab[k]
            self._lo[t] = tab["lo"]
            self._invdelta[t] = 1.0 / tab["delta"]
            self._deltasq6[t] = tab["delta"] * tab["delta"] / 6.0

    def _lookup(self, xval, ttype, dt_):
        """(u, mdu) per row: linear or spline interpolation
        (bond_table.cpp:588-616).  Tables are flat-indexed by
        type*tablength + bin — one gather per column, no per-row
        table-slice intermediates."""
        n = self.tablength
        T = lambda a: jnp.asarray(a, dt_)[ttype]
        lo = T(self._lo)
        invd = T(self._invdelta)
        it = jnp.clip((xval - lo) * invd, 0, n - 1).astype(jnp.int32)
        base = ttype.astype(jnp.int32) * n
        flat = lambda k: jnp.asarray(self._tabs[k].reshape(-1), dt_)
        g = lambda k, i: flat(k)[base + i]
        xi = g("x", it)
        if self.tabstyle == "linear":
            frac = (xval - xi) * invd
            return (g("e", it) + frac * g("de", it),
                    g("f", it) + frac * g("df", it))
        b = (xval - xi) * invd
        a = 1.0 - b
        it1 = jnp.minimum(it + 1, n - 1)
        d6 = T(self._deltasq6)
        u = (a * g("e", it) + b * g("e", it1)
             + ((a**3 - a) * g("e2", it)
                + (b**3 - b) * g("e2", it1)) * d6)
        f = (a * g("f", it) + b * g("f", it1)
             + ((a**3 - a) * g("f2", it)
                + (b**3 - b) * g("f2", it1)) * d6)
        return u, f


@register_bonded("bond", "table")
class BondTable(_TabulatedMixin, BondStyle):
    """bond_style table linear|spline N (src/MOLECULE/bond_table.cpp):
    fbond = f(r)/r with f = -dE/dr from the table."""

    name = "table"

    def __init__(self, ntypes, args=()):
        super().__init__(ntypes)
        self.tabstyle = "linear"
        self.tablength = 1000
        self._files = {}
        self._r0 = np.zeros(ntypes + 1)
        self._tabs = None

    def settings(self, style, n):
        if style not in ("linear", "spline"):
            raise ValueError(f"bond table style {style!r}")
        self.tabstyle = style
        self.tablength = int(n)

    def coeff(self, btype, filename, keyword):
        tb = _read_bonded_table(filename, keyword)
        self._files[btype] = self._resample(tb, tb["x"][0], tb["x"][-1])
        self._r0[btype] = tb["eq"] if tb["eq"] is not None else 0.0
        self._tabs = None

    def equilibrium_distance(self, btype):
        return float(self._r0[btype])

    def bond_fn(self, r2, btype):
        if self._tabs is None:
            self._pack(self._files)
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        u, mdu = self._lookup(r, btype, r2.dtype)
        return mdu / r, u


@register_bonded("angle", "table")
class AngleTable(_TabulatedMixin, AngleStyle):
    """angle_style table linear|spline N (src/MOLECULE/angle_table.cpp):
    file angles in degrees over [0, 180], forces converted to
    energy/radian on read; lookup over N uniform bins in [0, pi]."""

    name = "table"

    def __init__(self, ntypes, args=()):
        super().__init__(ntypes)
        self.tabstyle = "linear"
        self.tablength = 1000
        self._files = {}
        self._theta0 = np.full(ntypes + 1, np.pi)
        self._tabs = None

    def settings(self, style, n):
        if style not in ("linear", "spline"):
            raise ValueError(f"angle table style {style!r}")
        self.tabstyle = style
        self.tablength = int(n)

    def coeff(self, atype, filename, keyword):
        tb = _read_bonded_table(filename, keyword)
        if abs(tb["x"][0]) > 1e-6 or abs(tb["x"][-1] - 180.0) > 1e-6:
            raise ValueError("Angle table must range from 0 to 180 degrees")
        tb["x"] = tb["x"] * DEG2RAD
        tb["f"] = tb["f"] / DEG2RAD
        self._files[atype] = self._resample(tb, 0.0, np.pi)
        if tb["eq"] is not None:
            self._theta0[atype] = tb["eq"] * DEG2RAD
        self._tabs = None

    def equilibrium_angle(self, atype):
        return float(self._theta0[atype])

    def tuple_terms(self, xs, ttype, box, ctx, eflag, vflag, s=None,
                    idx=None, mask=None, role=None, **kw):
        if self._tabs is None:
            self._pack(self._files)
        dt_ = xs[0].dtype
        x1, x2, x3 = xs
        d1 = _mi(x1 - x2, box)
        d2 = _mi(x3 - x2, box)
        rsq1 = jnp.sum(d1 * d1, -1)
        rsq2 = jnp.sum(d2 * d2, -1)
        r1 = jnp.sqrt(jnp.maximum(rsq1, 1e-30))
        r2 = jnp.sqrt(jnp.maximum(rsq2, 1e-30))
        c = jnp.clip(jnp.sum(d1 * d2, -1) / (r1 * r2), -1.0, 1.0)
        sv = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
        sv = 1.0 / jnp.maximum(sv, 0.001)
        theta = jnp.arccos(c)
        u, mdu = self._lookup(theta, ttype, dt_)
        a = mdu * sv
        a11 = a * c / rsq1
        a12 = -a / (r1 * r2)
        a22 = a * c / rsq2
        f1 = a11[..., None] * d1 + a12[..., None] * d2
        f3 = a22[..., None] * d2 + a12[..., None] * d1
        f2 = -(f1 + f3)
        ed = {self.energy_key: u} if eflag else None
        vp = [(d1, f1), (d2, f3)] if vflag else None
        return [f1, f2, f3], ed, vp, None
