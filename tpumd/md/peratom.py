"""Per-atom tallies and the chunk framework (host-side, output steps).

Per-atom energy/virial come from the styles' ev_tally-analog per-atom
paths (reference eatom/vatom plumbing, src/pair.cpp:893 ev_setup;
compute_pe_atom.cpp, compute_stress_atom.cpp).  Results are returned in
TAG order (tag t -> index t-1) regardless of the engine's internal atom
ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _tag_order(sim):
    tag = np.asarray(jax.device_get(sim.state.tag))
    valid = tag > 0
    rows = np.nonzero(valid)[0]
    return rows[np.argsort(tag[rows])]


def pair_bonded_tallies(sim):
    """(eatom (N,), vatom (N,6)) in tag order, summing pair + bonded
    contributions.  Styles without a per-atom path raise ValueError."""
    s, neigh, _, _ = sim._carry
    ctx = sim._ctx
    n_rows = s.x.shape[0]
    eatom = jnp.zeros((n_rows,), s.x.dtype)
    vatom = jnp.zeros((n_rows, 6), s.x.dtype)
    if ctx.pair is not None:
        if ctx.is_cellgrid or not hasattr(ctx.pair, "compute_peratom"):
            raise ValueError(
                f"per-atom tallies not implemented for pair style "
                f"{ctx.pair.name!r} on this engine (use the matrix engine)")
        ea, va = ctx.pair.compute_peratom(s, neigh, ctx)
        eatom = eatom + ea
        vatom = vatom + va
    bconsts = sim._consts or (None,) * len(ctx.bonded)
    for style, bc in zip(ctx.bonded, bconsts):
        _, ea, va = style.compute(s, ctx, "atom", "atom", consts=bc)
        eatom = eatom + ea
        vatom = vatom + va
    order = _tag_order(sim)
    eatom = np.asarray(jax.device_get(eatom), np.float64)[order]
    vatom = np.asarray(jax.device_get(vatom), np.float64)[order]
    return eatom, vatom


def mass_tag_order(sim):
    order = _tag_order(sim)
    s = sim.state
    if s.rmass is not None:
        return np.asarray(jax.device_get(s.rmass), np.float64)[order]
    typ = np.asarray(jax.device_get(s.type))[order]
    return sim.mass[typ]


def stress_atom(sim):
    """compute stress/atom: -(m v v + pairwise/bonded virial) * nktv2p,
    per-atom, in pressure*volume units (src/compute_stress_atom.cpp)."""
    _, vatom = pair_bonded_tallies(sim)
    s = sim.state
    order = _tag_order(sim)
    v = np.asarray(jax.device_get(s.v), np.float64)[order]
    m = mass_tag_order(sim)
    u = sim.units
    kin = np.stack([
        m * v[:, 0] * v[:, 0], m * v[:, 1] * v[:, 1], m * v[:, 2] * v[:, 2],
        m * v[:, 0] * v[:, 1], m * v[:, 0] * v[:, 2], m * v[:, 1] * v[:, 2],
    ], axis=1) * u.mvv2e
    return -(kin + vatom) * u.nktv2p
