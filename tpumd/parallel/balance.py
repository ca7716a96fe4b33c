"""Load balance: recursive coordinate bisection over atom rows.

Reimplements the intent of src/balance.cpp + src/rcb.cpp for the TPU
decomposition model.  Two regimes:

- cell-grid engine: balance is BY CONSTRUCTION — compute is per grid
  SLOT (dense padded blocks), so equal slot ranges per chip mean equal
  work regardless of density; imbalance shows up only as padding FLOPs.
- matrix engine: per-atom arrays are block-sharded by ROW, so equalizing
  atoms per chip means reordering rows so each equal-size block is a
  spatially compact, equal-count subdomain.  `balance ... rcb` performs
  the recursive median bisection on the host and permutes the state
  (the analog of RCB::compute + Irregular::migrate_atoms).

The shift style ("balance x 20 1.1"-like iterative slab adjustment)
reduces to the same row permutation here: a 1-D sort by the shifted dim
with equal-count cuts IS the converged shift result.
"""

from __future__ import annotations

import jax
import numpy as np


def rcb_order(x: np.ndarray, nparts: int) -> np.ndarray:
    """Row permutation: recursive median bisection along the longest
    extent (RCB::compute, src/rcb.cpp) until nparts equal-count parts;
    returns indices so part k = order[k*n//nparts:(k+1)*n//nparts]."""
    n = len(x)
    order = np.arange(n)

    def rec(idx, parts):
        if parts == 1:
            return [idx]
        lo_parts = parts // 2
        frac = lo_parts / parts
        ext = x[idx].max(axis=0) - x[idx].min(axis=0)
        dim = int(np.argmax(ext))
        srt = idx[np.argsort(x[idx, dim], kind="stable")]
        cut = int(round(len(srt) * frac))
        return rec(srt[:cut], lo_parts) + rec(srt[cut:], parts - lo_parts)

    groups = rec(order, nparts)
    return np.concatenate(groups)


def dim_sort_order(x: np.ndarray, dims: str) -> np.ndarray:
    """grid-style balance ("balance x y ..."): lexicographic sort by the
    listed dims — equal row blocks then form the converged shift cuts."""
    keys = [x[:, "xyz".index(d)] for d in reversed(dims)]
    return np.lexsort(keys)


def imbalance(counts: np.ndarray) -> float:
    """max/mean imbalance factor (Balance::imbalance_factor)."""
    mean = counts.mean()
    return float(counts.max() / mean) if mean > 0 else 1.0


def slab_imbalance(x: np.ndarray, order: np.ndarray, nparts: int) -> float:
    """Spatial imbalance of equal-count row blocks under `order`: each
    block's atoms are histogrammed into nparts equal-volume slabs of the
    longest dim and the max/mean factor is taken over (block, slab)
    density — 1.0 when blocks are spatially compact equal subdomains,
    ~nparts when rows are spatially scrambled.  The same metric is used
    for before and after so the printed line actually verifies what the
    reorder did (a broken permutation no longer reads as success)."""
    n = len(x)
    ext_dim = int(np.argmax(x.max(0) - x.min(0)))
    lo, hi = x[:, ext_dim].min(), x[:, ext_dim].max() + 1e-12
    edges = [n * k // nparts for k in range(nparts + 1)]
    # per-block spatial spread along the cut dim: a compact block spans
    # ~1/nparts of the extent; count atoms OUTSIDE the block's fair slab
    spans = []
    for a, b in zip(edges[:-1], edges[1:]):
        xb = np.sort(x[order[a:b], ext_dim])
        spans.append((xb[-1] - xb[0]) * nparts / (hi - lo))
    return float(np.max(spans))


def balance_atoms(sim, style: str, dims: str = "", nparts: int | None = None):
    """Permute sim.state rows for equal-atom spatial blocks; returns
    (imbalance_before, imbalance_after): the max block-span factor of
    the equal-count row blocks before and after the reorder (same
    metric both sides)."""
    from tpumd.core.state import map_per_atom
    import jax.numpy as jnp
    if nparts is None:
        nparts = max(len(jax.devices()), 1)
    s = sim.state
    x = np.asarray(jax.device_get(s.x), np.float64)
    n = len(x)
    before = slab_imbalance(x, np.arange(n), nparts)
    if style == "rcb":
        order = rcb_order(x, nparts)
    else:
        ext_dim = int(np.argmax(x.max(0) - x.min(0)))
        order = dim_sort_order(x, dims or "xyz"[ext_dim])
    after = slab_imbalance(x, order, nparts)
    pj = jnp.asarray(order)
    sim.state = map_per_atom(s, lambda a: a[pj])
    if sim.special_tags is not None:
        sim.special_tags = sim.special_tags[order]
        sim.special_codes = sim.special_codes[order]
    sim.invalidate_ctx()
    return before, after
