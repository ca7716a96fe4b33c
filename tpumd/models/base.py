"""Pair-style base classes.

The reference dispatches through virtual Pair::compute with a factory
built from style_pair.h (src/force.cpp:237-254).  Here a pair style is a
host-side config object holding per-type coefficient tables as numpy
arrays; ``compute`` is pure and traceable.  Pairwise-additive styles only
define ``pair_fn``; many-body styles (EAM, SW, Tersoff) override
``compute`` wholesale.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpumd.ops.pairwise import pair_sums


class PairStyle:
    """Base pair style. Coeffs as (ntypes+1, ntypes+1) tables, 1-based."""

    name = "none"
    # does this style need a full neighbor list wider than its own cutoff?
    writedata = True

    def __init__(self, ntypes: int):
        self.ntypes = ntypes
        self.shift = False      # pair_modify shift
        self.mix = self.default_mix()
        self._setflag = np.zeros((ntypes + 1, ntypes + 1), dtype=bool)

    # -- lifecycle (settings/coeff/init), mirroring the reference contract --
    def default_mix(self) -> str:
        return "geometric"

    def settings(self, *args):
        raise NotImplementedError

    def coeff(self, itypes, jtypes, *args):
        raise NotImplementedError

    def init(self):
        """Fill unset i-j coeffs by mixing; compute derived tables."""
        raise NotImplementedError

    @property
    def max_cutoff(self) -> float:
        raise NotImplementedError

    def mix_energy(self, e1, e2, s1, s2) -> float:
        # Pair::mix_energy (src/pair.cpp:705-723)
        if self.mix == "sixthpower":
            return (2.0 * np.sqrt(e1 * e2) * s1**3 * s2**3) / (s1**6 + s2**6)
        return np.sqrt(e1 * e2)

    def mix_distance(self, s1, s2) -> float:
        if self.mix == "geometric":
            return np.sqrt(s1 * s2)
        if self.mix == "sixthpower":
            return (0.5 * (s1**6 + s2**6)) ** (1.0 / 6.0)
        return 0.5 * (s1 + s2)  # arithmetic

    # -- compute ---------------------------------------------------------
    def pair_fn(self, r2, itype, jtype):
        raise NotImplementedError

    # pairwise styles support the multi-image small-box mode for free
    # (the manybody overrides do their own gathers and do not, yet)
    supports_image_ext = True

    def compute(self, x, type_, box, idx, sbits, special_lj, special_coul,
                eflag: bool, vflag: bool, q=None, ext=None):
        ex = getattr(self, "pair_fn_ex", None)
        return pair_sums(x, type_, box, idx, sbits, self.pair_fn,
                         special_lj, special_coul, eflag, vflag,
                         q=q, pair_fn_ex=ex, ext=ext)

    def compute_peratom(self, s, neigh, ctx):
        """Per-atom pair energy/virial tallies (eatom (N,), vatom (N,6));
        reference ev_setup/ev_tally eatom/vatom (src/pair.cpp:893,1013)."""
        from tpumd.md.verlet import _pair_ext
        ex = getattr(self, "pair_fn_ex", None)
        _, eatom, vatom, _ = pair_sums(
            s.x, s.type, s.box, neigh.idx, neigh.sbits, self.pair_fn,
            ctx.special_lj, ctx.special_coul, "atom", "atom",
            q=s.q, pair_fn_ex=ex, ext=_pair_ext(s, ctx))
        return eatom, vatom

    # gather-free cell-grid path (TPU); pairwise styles get it for free
    supports_cellgrid = True

    def compute_cellgrid(self, x, type_, valid, box, cfg,
                         eflag: bool, vflag: bool, q=None, special=None,
                         bond=None):
        from tpumd.ops.cellgrid import cellgrid_pair_sums
        ex = getattr(self, "pair_fn_ex", None)
        return cellgrid_pair_sums(x, type_, valid, box, cfg, self.pair_fn,
                                  eflag, vflag, special=special,
                                  q=q if ex is not None else None,
                                  pair_fn_ex=ex, bond=bond)

    def table(self, arr, dtype):
        return jnp.asarray(arr, dtype=dtype)

    def coef(self, arr, itype, jtype, dtype):
        """Per-pair coefficient lookup.

        TPU gathers cost ~3 us per 1k rows regardless of table size, and
        the cell-grid kernel looks up coefficients on ~1e8-element pair
        blocks — for small type counts a sum of masked selects is
        hundreds of times cheaper than a gather and fuses into the
        surrounding elementwise work.  Falls back to a gather for large
        type tables where the select chain would dominate."""
        nt = self.ntypes
        if nt == 1:
            return jnp.asarray(float(np.asarray(arr)[1, 1]), dtype)
        if nt > 6:
            tbl = jnp.asarray(arr, dtype=dtype)
            if getattr(itype, "ndim", 0) >= 2 and itype.shape[-1] == 1:
                # broadcast forms — cell block (..., cap, 1) x (..., 1,
                # row) or matrix (N, 1) x (N, K): a full pair-shaped 2-D
                # gather lowers to a serialized loop on TPU (~100 ns per
                # element — 18 s/eval on a 46M-pair CHARMM block at 14
                # types).  Gather only the per-i rows, then resolve the
                # j side with an exact nt-term select chain that fuses
                # into the surrounding elementwise work.
                arow = tbl[itype[..., 0]]          # (..., nt+1)
                out = None
                for t in range(1, nt + 1):
                    term = jnp.where(jtype == t, arow[..., t][..., None],
                                     jnp.zeros((), dtype))
                    out = term if out is None else out + term
                return out
            return tbl[itype, jtype]
        a = np.asarray(arr)
        out = None
        for i in range(1, nt + 1):
            for j in range(i, nt + 1):
                if i == j:
                    hit = (itype == i) & (jtype == i)
                else:
                    hit = (((itype == i) & (jtype == j))
                           | ((itype == j) & (jtype == i)))
                term = jnp.where(hit, jnp.asarray(float(a[i, j]), dtype),
                                 jnp.zeros((), dtype))
                out = term if out is None else out + term
        return out
