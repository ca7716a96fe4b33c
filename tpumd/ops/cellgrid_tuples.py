"""Gather-free bonded tuples on the cell grid — the multi-chip molecular
force path.

The incidence path (models/bonded.py) gathers member positions by GLOBAL
index (``s.x[idx]``); under the z-slab sharded grid that lowers to an
all-gather of every per-atom array — O(N) comm per step, exactly what
the slab decomposition exists to avoid (reference ghost comm is O(halo),
src/comm_brick.cpp:538-639).  Here bonded members are found the same way
the pair sweep finds special/bond partners: per-atom member-TAG tables
ride the state (they permute with the atoms for free), and each step the
27-stencil candidate sweep matches those tags against neighbor-cell
contents — XLA lowers the rolls to one-plane collective-permutes, so the
whole molecular force evaluation stays O(halo).

Geometry requirement: every tuple member lies within one cell of every
other member (cell edge >= cutneigh/2 and bonded spans ~ a few bond
lengths — validated at setup against the actual topology).

Per-atom tables (state.extras, "_bt_" prefix, skipped by restart):
- _bt_utags  (N, P)        unique member tags over all tuples of the atom
                           (including itself — matched trivially in the
                           zero shift)
- per kind:  _bt_{kind}_pidx (N, K, arity) index into the P axis
             _bt_{kind}_ttype (N, K) tuple type (0 = empty)
             _bt_{kind}_role  (N, K) this atom's position in the tuple
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpumd.ops.cellgrid import _offs, _roll_nbr


def build_tuple_tables(natoms: int, topo: dict, arities: dict,
                       excl: dict | None = None) -> dict:
    """Host-side table construction in TAG order (row = tag - 1)."""
    excl = excl or {}
    per_atom_tags: list[dict] = [dict() for _ in range(natoms)]
    memb: dict = {k: [[] for _ in range(natoms)] for k in topo}

    for kind, tuples in topo.items():
        arity = arities[kind]
        skip = excl.get(kind, set())
        for ti, row in enumerate(np.asarray(tuples)):
            if ti in skip:
                continue
            ttype = int(row[0])
            tags = [int(t) for t in row[1:1 + arity]]
            for role, t in enumerate(tags):
                r = t - 1
                for u in tags:
                    per_atom_tags[r].setdefault(u, len(per_atom_tags[r]))
                memb[kind][r].append((ttype, role, tags))

    P = max(1, max(len(d) for d in per_atom_tags))
    utags = np.zeros((natoms, P), np.int32)
    for r, d in enumerate(per_atom_tags):
        for t, j in d.items():
            utags[r, j] = t

    out = {"_bt_utags": utags}
    for kind, lists in memb.items():
        arity = arities[kind]
        K = max(1, max(len(v) for v in lists))
        pidx = np.zeros((natoms, K, arity), np.int32)
        ttype = np.zeros((natoms, K), np.int32)
        role = np.zeros((natoms, K), np.int32)
        for r, items in enumerate(lists):
            for k, (tt, ro, tags) in enumerate(items):
                ttype[r, k] = tt
                role[r, k] = ro
                for a, t in enumerate(tags):
                    pidx[r, k, a] = per_atom_tags[r][t]
        out[f"_bt_{kind}_pidx"] = pidx
        out[f"_bt_{kind}_ttype"] = ttype
        out[f"_bt_{kind}_role"] = role
    return out


def validate_tuple_span(x, topo, arities, box, max_span: float,
                        excl: dict | None = None):
    """Every member must sit within max_span of every other member at
    setup (the stencil only reaches +-1 cell)."""
    excl = excl or {}
    ell = np.asarray(box.lengths, np.float64)
    per = np.asarray(box.periodic)
    worst = 0.0
    for kind, tuples in topo.items():
        arity = arities[kind]
        arr = np.asarray(tuples)
        if len(arr) == 0:
            continue
        keep = np.ones(len(arr), bool)
        for ti in excl.get(kind, set()):
            keep[ti] = False
        arr = arr[keep]
        pts = x[arr[:, 1:1 + arity] - 1]          # (M, arity, 3)
        for a in range(arity):
            for b in range(a + 1, arity):
                d = pts[:, a] - pts[:, b]
                d = d - np.where(per, np.round(d / ell) * ell, 0.0)
                if len(d):
                    worst = max(worst, float(np.sqrt(
                        (d * d).sum(1)).max()))
    if worst > max_span:
        raise ValueError(
            f"bonded tuple span {worst:.3f} exceeds the grid stencil "
            f"reach {max_span:.3f}; the tag-matched bonded path needs "
            "members within one cell")
    return worst


def match_members(x, tag, type_, q, valid, box, cfg, utags, cols=None):
    """Find positions/type/charge of the wanted tags among the 27-cell
    stencil candidates.  Returns (mpos (Np,P,3) wrap-corrected to the
    owner's image, mtype (Np,P), mq (Np,P) or None, found (Np,P)).
    cols: optional {name: (Np,) array} extra per-atom payloads matched
    alongside; appended as a dict of (Np,P) arrays in the return tuple
    when given (SHAKE needs member velocities/forces)."""
    cap = cfg.cap
    gshape = (cfg.nz, cfg.ny, cfg.nx, cap)
    dtype = x.dtype
    P = utags.shape[1]

    xg = [x[:, c].reshape(gshape) for c in range(3)]
    tg = type_.reshape(gshape)
    tagg = jnp.where(valid, tag, 0).reshape(gshape)
    qg = None if q is None else q.reshape(gshape)
    ug = utags.reshape(gshape + (P,))

    xoffs = _offs(cfg.nx)
    foldy = 3 * cap < 128
    yoffs = _offs(cfg.ny) if foldy else (0,)
    Lx, Ly, Lz = box.lengths[0], box.lengths[1], box.lengths[2]

    def xyrow(a, corrx, corry):
        row = jnp.concatenate(
            [_roll_nbr(a, o, 2, corrx) for o in xoffs], axis=-1)
        if not foldy:
            return row
        return jnp.concatenate(
            [_roll_nbr(row, o, 1, corry) for o in yoffs], axis=-1)

    rows = [xyrow(xg[0], Lx, None), xyrow(xg[1], None, Ly),
            xyrow(xg[2], None, None)]
    tagrow = xyrow(tagg, None, None)
    trow = xyrow(tg, None, None)
    qrow = None if qg is None else xyrow(qg, None, None)
    colrows = {} if cols is None else {
        k: xyrow(v.reshape(gshape), None, None) for k, v in cols.items()}

    zero = jnp.zeros(gshape, dtype)
    mposL = [[zero, zero, zero] for _ in range(P)]
    mtypeL = [zero for _ in range(P)]
    mqL = None if qg is None else [zero for _ in range(P)]
    mcolL = {k: [zero for _ in range(P)] for k in colrows}
    foundL = [jnp.zeros(gshape, bool) for _ in range(P)]

    shifts = ([(dz, 0) for dz in _offs(cfg.nz)] if foldy else
              [(dz, dy) for dz in _offs(cfg.nz) for dy in _offs(cfg.ny)])
    for dz, dy in shifts:
        def roll2(a, corrz, corry):
            r = _roll_nbr(a, dz, 0, corrz)
            return _roll_nbr(r, dy, 1, corry) if not foldy else r
        xj = [roll2(rows[0], None, None), roll2(rows[1], None, Ly),
              roll2(rows[2], Lz, None)]
        tagj = roll2(tagrow, None, None)
        tj = roll2(trow, None, None).astype(dtype)
        qj = None if qrow is None else roll2(qrow, None, None)
        cj = {k: roll2(v, None, None) for k, v in colrows.items()}
        mi_ok = None
        if min(cfg.nx, cfg.ny, cfg.nz) < 3:
            # axes under 3 cells show the same tag at several periodic
            # images (n==1: self cell ±L; n==2: direct + wrapped) — the
            # hit accumulation below would sum them all.  Keep only the
            # minimum image: the true member is within the tuple span
            # (< L/2 per the 2*cutneigh box guard), every other image
            # is >= L - span away.
            mi_ok = jnp.ones(gshape[:-1] + (cap, xj[0].shape[-1]), bool)
            for c, Lc in zip(range(3), (Lx, Ly, Lz)):
                dcc = xg[c][..., :, None] - xj[c][..., None, :]
                mi_ok = mi_ok & (jnp.abs(dcc) <= 0.5 * Lc)
        for p in range(P):
            want = ug[..., p]                        # (nz,ny,nx,cap)
            hit = (want[..., :, None] > 0) \
                & (want[..., :, None] == tagj[..., None, :])
            if mi_ok is not None:
                hit = hit & mi_ok
            # elementwise mask-and-reduce (NOT a dot: flattening the
            # sharded grid dims for a dot_general would all-gather)
            hitf = hit.astype(dtype)                 # (...,cap,rowlen)
            for c in range(3):
                mposL[p][c] = mposL[p][c] + jnp.sum(
                    hitf * xj[c][..., None, :], axis=-1)
            mtypeL[p] = mtypeL[p] + jnp.sum(
                hitf * tj[..., None, :], axis=-1)
            if mqL is not None:
                mqL[p] = mqL[p] + jnp.sum(
                    hitf * qj[..., None, :], axis=-1)
            for k in mcolL:
                mcolL[k][p] = mcolL[k][p] + jnp.sum(
                    hitf * cj[k][..., None, :], axis=-1)
            foundL[p] = foundL[p] | jnp.any(hit, axis=-1)

    npax = int(np.prod(gshape))

    def pack(lst):
        return jnp.stack([a.reshape(npax) for a in lst], axis=1)

    out_pos = jnp.stack(
        [pack([mposL[p][c] for p in range(P)]) for c in range(3)],
        axis=-1)
    mtype = pack(mtypeL).astype(jnp.int32)
    mq = None if mqL is None else pack(mqL)
    found = pack(foundL)
    if cols is not None:
        return out_pos, mtype, mq, found, {
            k: pack(v) for k, v in mcolL.items()}
    return out_pos, mtype, mq, found


def compute_bonded_grid(s, ctx, consts, eflag, vflag):
    """Evaluate every bonded style from tag-matched member data.

    Returns (f (Np,3) in grid-slot order, energies dict or None,
    virial6 or None, all_found bool)."""
    cfg = ctx.neigh_cfg
    valid = s.tag > 0
    ex = s.extras
    utags = ex["_bt_utags"]
    mpos, mtype, mq, found = match_members(
        s.x, s.tag, s.type, s.q, valid, s.box, cfg, utags)

    f = jnp.zeros_like(s.x)
    energies = {} if eflag else None
    virial = jnp.zeros((6,), s.x.dtype) if vflag else None
    all_found = jnp.asarray(True)

    for style in ctx.bonded:
        kind = style.kind
        pidx = ex.get(f"_bt_{kind}_pidx")
        if pidx is None:
            continue
        ttype = ex[f"_bt_{kind}_ttype"]
        role = ex[f"_bt_{kind}_role"]
        arity = style.arity
        xs = []
        mts = []
        mqs = []
        ok = ttype > 0
        for r in range(arity):
            sel = pidx[:, :, r]
            xs.append(jnp.take_along_axis(
                mpos, sel[..., None], axis=1))
            mts.append(jnp.take_along_axis(mtype, sel, axis=1))
            if mq is not None:
                mqs.append(jnp.take_along_axis(mq, sel, axis=1))
            ok = ok & jnp.take_along_axis(found, sel, axis=1)
        all_found = all_found & jnp.all(ok | (ttype <= 0))
        member_type = jnp.stack(mts, axis=-1)
        member_q = None if mq is None else jnp.stack(mqs, axis=-1)
        fb, ed, vir = style.reduce_from_xs(
            xs, ttype, role, ok, s.box, ctx, eflag, vflag,
            member_type=member_type, member_q=member_q)
        f = f + fb
        if eflag and ed:
            for k, v in ed.items():
                energies[k] = energies.get(k, 0.0) + v
        if vflag and vir is not None:
            virial = virial + vir
    return f, energies, virial, all_found
