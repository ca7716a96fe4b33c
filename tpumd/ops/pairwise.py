"""Generic pairwise force/energy/virial driver over padded neighbor matrices.

The TPU replacement for the reference's virtual Pair::compute half-list
loops (src/pair_lj_cut.cpp:69-140) and its ev_tally/virial machinery
(src/pair.cpp:893-1360): one vectorized i-centric pass over the (N, K)
neighbor matrix; forces come from a masked sum over the K axis (no
scatter), energies and the 6-component virial from masked reductions with
the 1/2 double-count factor of full lists.  Energy/virial work is gated by
trace-time flags, matching the reference's eflag/vflag template dispatch.

A pair style plugs in a ``pair_fn(r2, itype, jtype) -> (fpair, evdwl,
ecoul, fcoul)`` operating on safe (masked) squared distances; ``fpair`` is
the LAMMPS convention force prefactor f_ij = fpair * (x_i - x_j).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpumd.core.state import minimum_image  # noqa: F401 (re-export)


def pair_sums(x, type_, box, idx, sbits, pair_fn, special_lj, special_coul,
              eflag: bool, vflag: bool, q=None, pair_fn_ex=None, ext=None):
    """Compute (f, evdwl, ecoul, virial6) for a pairwise-additive style.

    special_lj/special_coul: (4,) weight tables indexed by sbits code
    (code 0 => weight 1.0), or None when no molecular topology exists.
    Styles needing in-kernel special handling (e.g. coul/long's k-space
    exclusion correction) provide pair_fn_ex(r2, itype, jtype, w_lj,
    w_coul, qi, qj) instead, returning pre-weighted terms.

    TPU layout notes: all j-side fields come from ONE packed gather
    (gather cost is per row), the distance math runs on per-component
    (N, K) arrays (a trailing dim of 3 tiles the VPU at 3/128), and the
    4-entry special weight tables are resolved with selects, not gathers.
    """
    n, k = idx.shape
    self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
    mask = idx != self_idx

    if ext is not None:
        # small-box multi-image mode (NeighborConfig.image_shifts): idx
        # addresses the (S*N)-row image-copy table; the virtual box has
        # minimum image disabled on expanded dims
        xj_tab, tj_tab, qj_tab, box = ext
    else:
        xj_tab, tj_tab, qj_tab = x, type_, q
    cols = [xj_tab, tj_tab.astype(x.dtype)[:, None]]
    if q is not None:
        cols.append(qj_tab[:, None])
    packed = jnp.concatenate(cols, axis=1)
    pj = packed[idx]                       # (N, K, 4|5)

    d = [x[:, c:c + 1] - pj[..., c] for c in range(3)]
    if box.istriclinic:
        d3 = minimum_image(jnp.stack(d, axis=-1), box)
        d = [d3[..., c] for c in range(3)]
    else:
        from tpumd.core.state import minimum_image_c
        d = [minimum_image_c(d[c], box, c) for c in range(3)]
    r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    r2safe = jnp.where(mask, r2, jnp.ones_like(r2))

    itype = type_[:, None]
    jtype = pj[..., 3].astype(jnp.int32)

    def wsel(table):
        t = jnp.asarray(table, x.dtype)
        return jnp.where(sbits == 1, t[1],
                         jnp.where(sbits == 2, t[2],
                                   jnp.where(sbits == 3, t[3], t[0])))

    if pair_fn_ex is not None:
        one = jnp.ones_like(r2safe)
        w_lj = wsel(special_lj) if special_lj is not None else one
        w_c = wsel(special_coul) if special_coul is not None else one
        qi = q[:, None] if q is not None else None
        qj = pj[..., 4] if q is not None else None
        fpair, evdwl, ecoul, fcoul = pair_fn_ex(
            r2safe, itype, jtype, w_lj, w_c, qi, qj)
        if fcoul is not None:
            fpair = fpair + fcoul
    else:
        fpair, evdwl, ecoul, fcoul = pair_fn(r2safe, itype, jtype)
        if special_lj is not None:
            w_lj = wsel(special_lj)
            fpair = fpair * w_lj
            if eflag:
                evdwl = evdwl * w_lj
        if fcoul is not None and special_coul is not None:
            w_c = wsel(special_coul)
            fcoul = fcoul * w_c
            if eflag:
                ecoul = ecoul * w_c
        if fcoul is not None:
            fpair = fpair + fcoul

    fpair = jnp.where(mask, fpair, 0)
    f = jnp.stack([jnp.sum(d[c] * fpair, axis=1) for c in range(3)], axis=1)

    if eflag == "atom" or vflag == "atom":
        # per-atom tallies (ev_tally eatom/vatom, src/pair.cpp:1013): the
        # i-centric full list gives each directed pair a 1/2 share
        etot = evdwl + (ecoul if ecoul is not None else 0.0)
        eatom = 0.5 * jnp.sum(jnp.where(mask, etot, 0), axis=1)
        vatom = 0.5 * jnp.stack([
            jnp.sum(fpair * d[0] * d[0], axis=1),
            jnp.sum(fpair * d[1] * d[1], axis=1),
            jnp.sum(fpair * d[2] * d[2], axis=1),
            jnp.sum(fpair * d[0] * d[1], axis=1),
            jnp.sum(fpair * d[0] * d[2], axis=1),
            jnp.sum(fpair * d[1] * d[2], axis=1),
        ], axis=1)
        return f, eatom, vatom, None

    e_vdwl = e_coul = None
    virial = None
    if eflag:
        e_vdwl = 0.5 * jnp.sum(jnp.where(mask, evdwl, 0))
        e_coul = (0.5 * jnp.sum(jnp.where(mask, ecoul, 0))
                  if ecoul is not None else jnp.zeros((), x.dtype))
    if vflag:
        # order matches the reference: xx yy zz xy xz yz
        virial = 0.5 * jnp.stack([
            jnp.sum(fpair * d[0] * d[0]), jnp.sum(fpair * d[1] * d[1]),
            jnp.sum(fpair * d[2] * d[2]), jnp.sum(fpair * d[0] * d[1]),
            jnp.sum(fpair * d[0] * d[2]), jnp.sum(fpair * d[1] * d[2]),
        ])
    return f, e_vdwl, e_coul, virial
