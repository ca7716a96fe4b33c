"""pair_style hybrid and hybrid/overlay.

Reimplements the reference's sub-style multiplexing
(src/pair_hybrid.cpp): each type pair maps to one sub-style (hybrid) or
several (overlay); pair_coeff routes by sub-style name.  Sub-styles run
on the shared neighbor matrix with a per-type-pair activation mask
wrapped around their kernels, and their forces/energies/virials sum.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpumd.models.base import PairStyle
from tpumd.models.registry import register_pair


class _MaskedStyle:
    """Wrap a sub-style so its kernel only acts on activated type pairs."""

    def __init__(self, style, ntypes):
        self.style = style
        self.active = np.zeros((ntypes + 1, ntypes + 1), dtype=bool)

    def wrap_pair_fn(self):
        base_ex = getattr(self.style, "pair_fn_ex", None)
        act = self.active

        if base_ex is not None:
            def fn_ex(r2, it, jt, w_lj, w_c, qi, qj):
                m = jnp.asarray(act)[it, jt]
                fp, e, ec, fc = base_ex(r2, it, jt, w_lj, w_c, qi, qj)
                z = jnp.zeros_like(r2)
                return (jnp.where(m, fp, z),
                        jnp.where(m, e, z) if e is not None else None,
                        jnp.where(m, ec, z) if ec is not None else None,
                        jnp.where(m, fc, z) if fc is not None else None)
            return None, fn_ex

        base = self.style.pair_fn

        def fn(r2, it, jt):
            m = jnp.asarray(act)[it, jt]
            fp, e, ec, fc = base(r2, it, jt)
            z = jnp.zeros_like(r2)
            return (jnp.where(m, fp, z),
                    jnp.where(m, e, z) if e is not None else None,
                    jnp.where(m, ec, z) if ec is not None else None,
                    jnp.where(m, fc, z) if fc is not None else None)
        return fn, None


@register_pair("hybrid")
class PairHybrid(PairStyle):
    name = "hybrid"
    overlay = False
    supports_cellgrid = False

    def __init__(self, ntypes: int):
        super().__init__(ntypes)
        self.subs: list[_MaskedStyle] = []
        self._names: list[str] = []

    def settings(self, *args):
        from tpumd.models.registry import _PAIR_STYLES, create_pair_style
        # split args into sub-style groups on known style names
        groups = []
        for tok in args:
            if isinstance(tok, str) and tok in _PAIR_STYLES:
                groups.append([tok])
            else:
                groups[-1].append(tok)
        for g in groups:
            style = create_pair_style(g[0], self.ntypes, g[1:],
                                      units=getattr(self, "units", None))
            self.subs.append(_MaskedStyle(style, self.ntypes))
            self._names.append(g[0])

    def _find(self, name):
        matches = [m for m, n in zip(self.subs, self._names) if n == name]
        if not matches:
            raise ValueError(f"hybrid sub-style {name!r} not found")
        return matches

    def coeff(self, ilo, ihi, jlo, jhi, name, *args):
        name = str(name)
        if name == "none":
            for m in self.subs:
                m.active[ilo:ihi + 1, jlo:jhi + 1] = False
                m.active[jlo:jhi + 1, ilo:ihi + 1] = False
            return
        targets = self._find(name)
        if not self.overlay:
            # plain hybrid: the pair belongs to this style only
            for m in self.subs:
                if m not in targets:
                    m.active[ilo:ihi + 1, jlo:jhi + 1] = False
                    m.active[jlo:jhi + 1, ilo:ihi + 1] = False
        for m in targets:
            m.style.coeff(ilo, ihi, jlo, jhi, *args)
            for i in range(ilo, ihi + 1):
                for j in range(jlo, jhi + 1):
                    m.active[i, j] = m.active[j, i] = True
            self._setflag[ilo:ihi + 1, jlo:jhi + 1] = True

    def init(self):
        for m in self.subs:
            m.style.allow_unset = True
            m.style.shift = self.shift or m.style.shift
            m.style.init()

    @property
    def max_cutoff(self) -> float:
        return max(m.style.max_cutoff for m in self.subs)

    def ecoul_self(self, q):
        """Per-atom coulomb self-energy summed over sub-styles that carry
        one (coul/dsf:37, coul/wolf): the reference tallies it per
        sub-style over ALL local atoms via ev_tally(i,i,...), independent
        of the type-pair activation mask."""
        scales = getattr(self, "scales", None) or [1.0] * len(self.subs)
        e = jnp.zeros((), q.dtype)
        for scale, m in zip(scales, self.subs):
            if hasattr(m.style, "ecoul_self"):
                e = e + scale * m.style.ecoul_self(q)
        return e

    @staticmethod
    def _sub_compute(m, x, type_, box, idx, sbits, special_lj,
                     special_coul, eflag, vflag, q, ext):
        """One sub-style's (f, evdwl, ecoul, virial6).

        Manybody sub-styles (EnergyPairStyle: sw/tersoff/atm/...) run
        their own autodiff compute on a masked neighbor view: candidates
        whose (i,j) type pair is inactive are redirected to self, which
        the energy kernels already exclude (the analog of the
        reference's per-sub-style neighbor sublists,
        src/pair_hybrid.cpp:init_style skip lists)."""
        if hasattr(m.style, "energy"):
            act = jnp.asarray(m.active)
            self_idx = jnp.arange(x.shape[0], dtype=idx.dtype)[:, None]
            pairact = act[type_[:, None], type_[idx]]
            idx_sub = jnp.where(pairact, idx, self_idx)
            return m.style.compute(
                x, type_, box, idx_sub, sbits, special_lj, special_coul,
                eflag, vflag, q=q, ext=ext)
        from tpumd.ops.pairwise import pair_sums
        fn, fn_ex = m.wrap_pair_fn()
        return pair_sums(
            x, type_, box, idx, sbits, fn, special_lj, special_coul,
            eflag, vflag, q=q, pair_fn_ex=fn_ex, ext=ext)

    def compute(self, x, type_, box, idx, sbits, special_lj, special_coul,
                eflag: bool, vflag: bool, q=None, ext=None):
        f = jnp.zeros_like(x)
        ev = jnp.zeros((), x.dtype)
        ec = jnp.zeros((), x.dtype)
        vir = jnp.zeros((6,), x.dtype) if vflag else None
        for m in self.subs:
            fs, e1, e2, v6 = self._sub_compute(
                m, x, type_, box, idx, sbits, special_lj, special_coul,
                eflag, vflag, q, ext)
            f = f + fs
            if eflag:
                if e1 is not None:
                    ev = ev + e1
                if e2 is not None:
                    ec = ec + e2
            if vflag:
                vir = vir + v6
        return f, (ev if eflag else None), (ec if eflag else None), vir


@register_pair("hybrid/overlay")
class PairHybridOverlay(PairHybrid):
    name = "hybrid/overlay"
    overlay = True


@register_pair("hybrid/scaled")
class PairHybridScaled(PairHybrid):
    """hybrid/overlay with a scale factor before each sub-style
    (src/pair_hybrid_scaled.cpp): forces/energies/virials of sub-style k
    are multiplied by scale_k.  Constant scales only (the reference also
    accepts equal-style variables, re-read each step)."""

    name = "hybrid/scaled"
    overlay = True

    def settings(self, *args):
        from tpumd.models.registry import _PAIR_STYLES
        # every sub-style group is preceded by its numeric scale factor:
        # a token directly before a style name that is not itself a style
        # name is a scale
        toks = list(args)
        self.scales = []
        filtered = []
        i = 0
        while i < len(toks):
            tok = toks[i]
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if (isinstance(nxt, str) and nxt in _PAIR_STYLES
                    and not (isinstance(tok, str) and tok in _PAIR_STYLES)):
                self.scales.append(float(tok))
                i += 1
                continue
            filtered.append(tok)
            i += 1
        super().settings(*filtered)
        if len(self.scales) != len(self.subs):
            raise ValueError("hybrid/scaled: need one scale per sub-style")

    def compute(self, x, type_, box, idx, sbits, special_lj, special_coul,
                eflag: bool, vflag: bool, q=None, ext=None):
        f = jnp.zeros_like(x)
        ev = jnp.zeros((), x.dtype)
        ec = jnp.zeros((), x.dtype)
        vir = jnp.zeros((6,), x.dtype) if vflag else None
        for scale, m in zip(self.scales, self.subs):
            fs, e1, e2, v6 = self._sub_compute(
                m, x, type_, box, idx, sbits, special_lj, special_coul,
                eflag, vflag, q, ext)
            f = f + scale * fs
            if eflag:
                if e1 is not None:
                    ev = ev + scale * e1
                if e2 is not None:
                    ec = ec + scale * e2
            if vflag:
                vir = vir + scale * v6
        return f, (ev if eflag else None), (ec if eflag else None), vir
