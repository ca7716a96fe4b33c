"""Gather-free cell-grid force path (the TPU throughput engine).

Redesign of the reference's binned half neighbor lists
(src/npair_half_bin_newton.cpp) for TPU memory behavior: random per-pair
gathers are slow on TPU, so instead of building index lists we keep atoms
*physically stored in cell order* — a dense grid (nz, ny, nx, cap) of
fixed-capacity cells — and compute forces by sliding the whole grid with
``jnp.roll`` over the 27-cell stencil.  Each shift produces dense
(cell x cell) pair blocks: contiguous reads, no gathers, masked VPU math.
Periodic wrap is free: rolled cells come from the opposite box face and
the minimum-image convention fixes up the distances.

This replaces both the reference's neighbor-list pair loops and the
fork's per-thread force-replica decomposition (src/OPENMP/thr_omp.h): the
"threads" are the VPU lanes of the cell-pair blocks, and accumulation is
a masked reduction instead of replicated arrays + tree reduction.

Rebuild = re-binning (a permutation of the atom arrays into grid-slot
order), on the same every/delay/half-skin schedule.  Between rebuilds the
cell assignment is frozen, so the candidate set is a superset of the
reference's frozen Verlet list (pairs crossing the force cutoff between
rebuilds are *included* here but missed by the reference — equal or
better physics; exact-parity tests use the matrix path).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpumd.core.state import Box, MDState


@dataclasses.dataclass(frozen=True)
class CellGridConfig:
    cutneigh: float
    skin: float
    nx: int
    ny: int
    nz: int
    cap: int                 # atoms per cell (padded capacity)
    every: int = 1
    delay: int = 0
    check: bool = True
    # neigh_modify exclude group pairs (gmask-bit tuples), enforced
    # in-kernel by the granular sweep
    exclude_bits: tuple = ()

    @property
    def ncells(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def capacity(self) -> int:
        return self.ncells * self.cap

    def stencil(self):
        return [(dx, dy, dz) for dz in _offs(self.nz)
                for dy in _offs(self.ny) for dx in _offs(self.nx)]


@struct.dataclass
class CellGridState:
    valid: jnp.ndarray      # (Np,) bool — slot holds a real atom
    xhold: jnp.ndarray      # (Np, 3) positions at last build
    ago: jnp.ndarray
    nbuilds: jnp.ndarray
    overflow: jnp.ndarray
    max_count: jnp.ndarray  # max atoms seen in one cell
    # (natoms,) tag->slot map, refreshed at every rebuild; molecular
    # styles read it instead of re-deriving it per force eval (a
    # capacity-sized scatter costs ~2 ms per call on TPU)
    row2slot: jnp.ndarray | None = None
    # granular: COMPACT tag-keyed shear history (ops/cellgrid_gran.py):
    # per-slot partner tags (Np, KH) + accumulated shear (Np, KH, 3);
    # per-atom tables, so re-bins carry them with one gather + scatter
    shear_tags: jnp.ndarray | None = None
    shear: jnp.ndarray | None = None


def choose_cellgrid_config(box: Box, cutneigh: float, skin: float,
                           natoms: int, *, every=1, delay=0, check=True,
                           cap: int | None = None,
                           box_margin: float = 1.0) -> CellGridConfig:
    ell = np.asarray(jax.device_get(box.lengths), dtype=np.float64)
    if (ell < 2.0 * cutneigh).any():
        raise ValueError(
            f"box lengths {ell} must be >= 2*cutneigh ({2 * cutneigh:.3f})")
    nx, ny, nz = [max(1, int(np.floor(L / (cutneigh * box_margin))))
                  for L in ell]
    if cap is None:
        mean = natoms / (nx * ny * nz)
        cap = int(np.ceil((mean * 1.45 + 4) / 4) * 4)
    return CellGridConfig(cutneigh=float(cutneigh), skin=float(skin),
                          nx=nx, ny=ny, nz=nz, cap=int(cap),
                          every=every, delay=delay, check=check)


def _cell_ids(x, valid, box: Box, cfg: CellGridConfig):
    ell = box.lengths
    dims = jnp.array([cfg.nx, cfg.ny, cfg.nz])
    rel = (x - box.lo) / ell * dims
    ci = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, dims - 1)
    cid = (ci[:, 2] * cfg.ny + ci[:, 1]) * cfg.nx + ci[:, 0]
    return jnp.where(valid, cid, cfg.ncells)


@partial(jax.jit, static_argnames=("cfg",))
def bin_permutation(x, valid, box: Box, cfg: CellGridConfig):
    """Permutation taking atoms into grid-slot order.

    Returns (perm (Np,) int32 atom index per slot or -1, valid_new,
    max_count, overflow).  Np = cfg.capacity; x must be wrapped.
    """
    npad = cfg.capacity
    cid = _cell_ids(x, valid, box, cfg)
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = (jnp.arange(x.shape[0], dtype=jnp.int32) - first.astype(jnp.int32))
    real = sorted_cid < cfg.ncells
    max_count = jnp.max(jnp.where(real, rank, -1)) + 1
    overflow = max_count > cfg.cap
    ok = real & (rank < cfg.cap)
    slot = jnp.where(ok, sorted_cid * cfg.cap + jnp.minimum(rank, cfg.cap - 1),
                     npad)
    perm = jnp.full((npad,), -1, dtype=jnp.int32)
    perm = perm.at[slot].set(order.astype(jnp.int32), mode="drop")
    valid_new = perm >= 0
    return perm, valid_new, max_count, overflow


@partial(jax.jit, static_argnames=("natoms", "cfg"))
def bin_compact(x, tag, natoms: int, box: Box, cfg: CellGridConfig,
                row2slot=None):
    """Compact re-bin: sort the ``natoms`` REAL atoms only instead of
    argsorting all ``cfg.capacity`` padded slots — at the chain bench's
    4x slot padding this cuts the rebuild sort cost ~4x.

    TPU cost model: per-call row-op overhead (~1.7 ms at 32k rows)
    dominates over width, so the slot and tag-index columns ride the
    ONE key sort as payloads, the within-cell rank comes from a cummax
    scan (a searchsorted would be a second ~3 ms sorted lookup), and
    the tag->slot map is carried across rebuilds instead of being
    re-scattered from the capacity-sized tag array.

    Returns (src (n,) source slot per placement, dst (n,) destination
    slot or capacity for overflow-dropped atoms, row2slot_new,
    max_count, overflow).
    """
    npad = cfg.capacity
    n = natoms
    if row2slot is None:
        target = jnp.where(tag > 0, tag - 1, n)
        row2slot = jnp.zeros((n,), jnp.int32).at[target].set(
            jnp.arange(npad, dtype=jnp.int32), mode="drop")
    xc = x[row2slot]
    ell = box.lengths
    dims = jnp.array([cfg.nx, cfg.ny, cfg.nz])
    rel = (xc - box.lo) / ell * dims
    ci = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, dims - 1)
    cid = (ci[:, 2] * cfg.ny + ci[:, 1]) * cfg.nx + ci[:, 0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_cid, src, tagidx = jax.lax.sort(
        (cid, row2slot, iota), num_keys=1)
    newseg = jnp.concatenate([jnp.ones((1,), bool),
                              sorted_cid[1:] != sorted_cid[:-1]])
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(newseg, iota, 0))
    rank = iota - first
    max_count = jnp.max(rank) + 1
    overflow = max_count > cfg.cap
    dst = jnp.where(rank < cfg.cap,
                    sorted_cid * cfg.cap + jnp.minimum(rank, cfg.cap - 1),
                    npad)
    row2slot_new = jnp.zeros((n,), jnp.int32).at[tagidx].set(
        jnp.minimum(dst, npad - 1))
    return src, dst, row2slot_new, max_count, overflow


def row2slot_from_tags(tag, natoms: int):
    """(natoms,) tag->slot map from the permuted tag array (setup path)."""
    npad = tag.shape[0]
    target = jnp.where(tag > 0, tag - 1, natoms)
    return jnp.zeros((natoms,), jnp.int32).at[target].set(
        jnp.arange(npad, dtype=jnp.int32), mode="drop")


@partial(jax.jit, static_argnames=("capacity",))
def apply_permutation_compact(state: MDState, src, dst,
                              capacity: int) -> MDState:
    """Reorder per-atom arrays via n-sized gather + scatter (the compact
    counterpart of apply_permutation; empty slots zeroed).

    TPU row ops cost ~1.7 ms per CALL at 32k rows nearly independent of
    width, so in f32 mode the f32 fields are bitcast into the INT32
    table and the whole state moves in ONE gather + ONE scatter.  The
    fused table must be integer-typed: TPU vector ops flush f32
    denormals, so int32 values (tags/types — denormal bit patterns)
    bitcast into a float table can be silently zeroed if XLA routes the
    copy through an arithmetic fusion; int32 moves are always exact."""
    from tpumd.core.state import iter_per_atom, replace_per_atom
    fdt = state.x.dtype
    fuse_ints = fdt == jnp.float32
    groups: dict = {}
    for name, a in iter_per_atom(state):
        key = jnp.int32 if (fuse_ints and a.dtype == fdt) else a.dtype
        groups.setdefault(key, []).append((name, a))
    updates = {}
    for dt_, fields in groups.items():
        flat = []
        for _, a in fields:
            col = a.reshape(a.shape[0], -1)
            if col.dtype != dt_:
                col = jax.lax.bitcast_convert_type(col, dt_)
            flat.append(col)
        widths = [f.shape[1] for f in flat]
        packed = jnp.concatenate(flat, axis=1)
        out = jnp.zeros_like(packed).at[dst].set(
            packed[src], mode="drop", unique_indices=True)
        off = 0
        for (name, a), w in zip(fields, widths):
            col = out[:, off:off + w]
            if col.dtype != a.dtype:
                col = jax.lax.bitcast_convert_type(col, a.dtype)
            updates[name] = col.reshape((capacity,) + a.shape[1:])
            off += w
    return replace_per_atom(state, updates)


@jax.jit
def apply_permutation(state: MDState, perm, valid_new) -> MDState:
    """Reorder all per-atom arrays into grid-slot order (capacity Np).

    Gather cost on TPU is per ROW, so all same-dtype fields are packed
    into one wide table and gathered together (two gathers total: floats
    + ints) instead of one gather per field."""
    from tpumd.core.state import iter_per_atom, replace_per_atom
    idx = jnp.maximum(perm, 0)
    groups: dict = {}
    for name, a in iter_per_atom(state):
        groups.setdefault(a.dtype, []).append((name, a))
    updates = {}
    for dt_, fields in groups.items():
        flat = [a.reshape(a.shape[0], -1) for _, a in fields]
        widths = [f.shape[1] for f in flat]
        packed = jnp.concatenate(flat, axis=1)
        out = jnp.take(packed, idx, axis=0)
        out = jnp.where(valid_new[:, None], out, 0)
        off = 0
        for (name, a), w in zip(fields, widths):
            updates[name] = out[:, off:off + w].reshape(
                (idx.shape[0],) + a.shape[1:])
            off += w
    return replace_per_atom(state, updates)


@partial(jax.jit, static_argnames=("capacity",))
def pad_state(state: MDState, capacity: int) -> MDState:
    """Pad per-atom arrays to the grid capacity (invalid slots at the end)."""
    from tpumd.core.state import map_per_atom
    n = state.x.shape[0]
    extra = capacity - n
    if extra < 0:
        raise ValueError("capacity smaller than atom count")
    if extra == 0:
        return state

    def pad(a):
        width = ((0, extra),) + ((0, 0),) * (a.ndim - 1)
        return jnp.pad(a, width, constant_values=0)

    return map_per_atom(state, pad)


def _offs(n: int, periodic: bool = True):
    """Stencil offsets along one axis.

    Periodic axes always get all three offsets: with n == 2 the ±1
    rolls reach the same cell under DIFFERENT wrap corrections (direct
    and wrapped image), and with n == 1 they produce the ±L periodic
    images of the self cell — the minimum-image correction for a box
    one cell wide.  Valid because every config guards L >= 2*cutneigh,
    so at most one image of any pair is in range (reference analog:
    multi-hop ghosts when cutoff ≳ subdomain, src/comm_brick.cpp:191).
    Non-periodic axes deduplicate offsets that alias mod n: the roll
    carries no wrap correction there, so ±1 would present the same
    atoms at identical coordinates twice (n == 2) or thrice (n == 1).
    """
    if periodic:
        return (-1, 0, 1)
    return (-1, 0, 1) if n >= 3 else ((-1, 0) if n == 2 else (0,))


def _roll_nbr(a, o: int, axis: int, corr):
    """Grid content of the neighbor cell at offset +o along axis.

    corr (box length or None) is added/subtracted where the periodic wrap
    crossed the box face, so distances need no per-pair minimum-image fix.
    """
    r = jnp.roll(a, -o, axis=axis)
    if o == 0 or corr is None:
        return r
    n = a.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    return (r + jnp.where(idx + o >= n, corr, 0).astype(a.dtype)
            - jnp.where(idx + o < 0, corr, 0).astype(a.dtype))


def compact_state(state: MDState, valid, natoms: int) -> MDState:
    """Gather valid atoms to the front and truncate to natoms rows."""
    from tpumd.core.state import map_per_atom
    order = jnp.argsort(~valid)  # stable: valid slots first
    idx = order[:natoms]
    return map_per_atom(state, lambda a: jnp.take(a, idx, axis=0))


def cellgrid_pair_sums(x, type_, valid, box: Box, cfg: CellGridConfig,
                       pair_fn, eflag: bool, vflag: bool,
                       special=None, q=None, pair_fn_ex=None, bond=None):
    """Forces/energy/virial via rolled dense cell-pair blocks.

    The x AND y stencil offsets are folded into one (up to) 9*cap-wide
    j-row, so only the z offsets are looped: 3 shifts of (cap, 9cap)
    blocks.  A wide row keeps the VPU lane dimension full (a 3*cap row
    at small cap tiles lanes at ~30%).  Periodic wrap is handled by
    per-cell coordinate corrections at roll time.

    special: optional (tag (Np,), special_tags (Np,S), w_lj (Np,S),
    w_coul (Np,S)) — 1-2/1-3/1-4 pair weighting resolved in-kernel by
    comparing each candidate's rolled tag against the i slot's special
    list; entries where BOTH weights are 1 should be pre-filtered out
    (the grid analog of the matrix path's sbits; reference SBBITS
    packing, src/npair_half_bin_newton.cpp:114).
    w = 1 + sum_s hit_s*(w_s - 1).

    bond: optional (bond_tags (Np,B), bond_btypes (Np,B), bond_fn) —
    2-body bonded forces ride the same rolled blocks by matching each
    candidate's tag against the i slot's bond-partner list (valid when
    the bond's max reach <= cutneigh, e.g. FENE's hard R0 limit), so
    molecular decks pay ZERO per-step gathers for bonds.  When given,
    a fifth return value carries the 1/2-tallied bond energy.

    q/pair_fn_ex: charged styles with an in-kernel special correction
    (e.g. coul/long's k-space exclusion term, src/pair_lj_charmm_coul_
    long.cpp:120) get per-pair charges and both weight planes passed to
    ``pair_fn_ex(r2, ti, tj, w_lj, w_coul, qi, qj)`` which returns
    pre-weighted (fpair, evdwl, ecoul, fcoul).
    """
    cap = cfg.cap
    gshape = (cfg.nz, cfg.ny, cfg.nx, cap)
    dtype = x.dtype

    xg = [x[:, c].reshape(gshape) for c in range(3)]
    tg = type_.reshape(gshape)
    vg = valid.reshape(gshape)

    xoffs = _offs(cfg.nx)
    # fold the y offsets into the row too when 3*cap would starve the VPU
    # lane dimension (small cells); at large cap the narrow fold is
    # cheaper on HBM
    foldy = 3 * cap < 128
    if special is not None and pair_fn_ex is not None:
        # heavy kernels (charged + in-kernel special matching): folding
        # y cuts the unrolled shift count 9 -> 3, which is the dominant
        # compile-size lever (the rhodo-class segment otherwise unrolls
        # 9 copies of the S-wide matching chain); runtime is within
        # noise of the narrow fold at these block sizes
        foldy = True
    if os.environ.get("TPUMD_FOLDY"):
        foldy = os.environ["TPUMD_FOLDY"] == "1"
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
    trow = xyrow(tg, None, None)
    vrow = xyrow(vg, None, None)
    rowlen = len(xoffs) * len(yoffs) * cap
    if q is not None:
        qg = q.reshape(gshape)
        qrow = xyrow(qg, None, None)
    tagrow = None
    if special is not None:
        atag, stags, sw_lj_in, sw_coul_in = special
        tagrow = xyrow(atag.reshape(gshape), None, None)
        S = stags.shape[1]
        stags_g = stags.reshape(gshape + (S,))
        sw_g = sw_lj_in.reshape(gshape + (S,))
        swc_g = (None if sw_coul_in is None
                 else sw_coul_in.reshape(gshape + (S,)))
    if bond is not None:
        btags_in, btypes_in, bond_fn, atag_b, bond_excl = bond
        if tagrow is None:
            tagrow = xyrow(atag_b.reshape(gshape), None, None)
        B = btags_in.shape[1]
        btags_g = btags_in.reshape(gshape + (B,))
        btypes_g = btypes_in.reshape(gshape + (B,))

    # self-exclusion: in the zero shift, slot j == own slot within the
    # (ox=0, oy=0) segment of the row
    zero_seg = yoffs.index(0) * len(xoffs) + xoffs.index(0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 1)
    not_self = jj != ii + zero_seg * cap

    fx = [jnp.zeros(gshape, dtype) for _ in range(3)]
    evdwl = jnp.zeros((), dtype)
    ecoul = jnp.zeros((), dtype)
    ebond = jnp.zeros((), dtype)
    virial = jnp.zeros((6,), dtype) if vflag else None

    shifts = ([(dz, 0) for dz in _offs(cfg.nz)] if foldy else
              [(dz, dy) for dz in _offs(cfg.nz) for dy in _offs(cfg.ny)])
    for dz, dy in shifts:
        def roll2(a, corrz, corry):
            r = _roll_nbr(a, dz, 0, corrz)
            return _roll_nbr(r, dy, 1, corry) if not foldy else r
        xj = [roll2(rows[0], None, None), roll2(rows[1], None, Ly),
              roll2(rows[2], Lz, None)]
        vj = roll2(vrow, None, None)
        tj = roll2(trow, None, None)

        # (nz, ny, nx, cap_i, rowlen) pair blocks
        d = [xg[c][..., :, None] - xj[c][..., None, :] for c in range(3)]
        r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        mask = vg[..., :, None] & vj[..., None, :]
        if dz == 0 and dy == 0:
            mask = mask & not_self
        r2 = jnp.where(mask, r2, jnp.ones_like(r2))

        if pair_fn_ex is not None:
            one = jnp.ones(mask.shape, dtype)
            w_lj = w_coul = one
            if special is not None:
                tagj = roll2(tagrow, None, None)
                w_lj = w_coul = None
                for si in range(S):
                    sti = stags_g[..., :, si:si + 1]   # (..., cap, 1)
                    hit = (sti > 0) & (sti == tagj[..., None, :])
                    dl = jnp.where(hit, sw_g[..., :, si:si + 1] - 1.0, 0.0)
                    w_lj = dl if w_lj is None else w_lj + dl
                    dc = jnp.where(hit, swc_g[..., :, si:si + 1] - 1.0, 0.0)
                    w_coul = dc if w_coul is None else w_coul + dc
                w_lj = 1.0 + w_lj
                w_coul = 1.0 + w_coul
            qi = qg[..., :, None]
            qjj = roll2(qrow, None, None)[..., None, :]
            fp, e, ec, fcoul = pair_fn_ex(
                r2, tg[..., :, None], tj[..., None, :],
                w_lj, w_coul, qi, qjj)
            if fcoul is not None:
                fp = fp + fcoul
        else:
            fp, e, ec, fcoul = pair_fn(
                r2, tg[..., :, None], tj[..., None, :])
            if fcoul is not None:
                fp = fp + fcoul
            if special is not None:
                tagj = roll2(tagrow, None, None)
                w = jnp.ones(mask.shape, dtype)
                for si in range(S):
                    sti = stags_g[..., :, si:si + 1]   # (..., cap, 1)
                    hit = (sti > 0) & (sti == tagj[..., None, :])
                    w = w + jnp.where(hit,
                                      sw_g[..., :, si:si + 1] - 1.0, 0.0)
                fp = fp * w
                if eflag:
                    e = e * w
        if bond is not None:
            # 2-body bonds matched in-kernel like the special lists;
            # bond force is NOT special-weighted and adds on top of the
            # (excluded) pair term
            tagj_b = roll2(tagrow, None, None)[..., None, :]
            if min(cfg.nx, cfg.ny, cfg.nz) < 3:
                # axes under 3 cells present a partner at several
                # periodic images; pair terms are cutoff-masked but
                # bonds are not — keep only the minimum image (unique:
                # configs guard L >= 2*cutneigh >= 2*bond reach)
                mi_ok = ((jnp.abs(d[0]) <= 0.5 * Lx)
                         & (jnp.abs(d[1]) <= 0.5 * Ly)
                         & (jnp.abs(d[2]) <= 0.5 * Lz))
                mask_b = mask & mi_ok
            else:
                mask_b = mask
            bhit = bfp = None
            btype_hit = jnp.zeros(mask.shape, jnp.int32)
            for bi in range(B):
                bt = btags_g[..., :, bi:bi + 1]
                hit = (bt > 0) & (bt == tagj_b)
                bhit = hit if bhit is None else (bhit | hit)
                btype_hit = jnp.where(hit, btypes_g[..., :, bi:bi + 1],
                                      btype_hit)
            bf, be = bond_fn(r2, btype_hit)
            bondmask = bhit & mask_b
            if bond_excl:
                # the special list was exactly {bond partners, w=0}:
                # bonded pairs take ONLY the bond force
                fp = jnp.where(bondmask, bf, fp)
                if eflag:
                    e = jnp.where(bondmask, 0.0, e)
            else:
                fp = fp + jnp.where(bondmask, bf, 0.0)
            if eflag:
                ebond = ebond + 0.5 * jnp.sum(jnp.where(bondmask, be, 0))
        fp = jnp.where(mask, fp, 0)
        for c in range(3):
            fx[c] = fx[c] + jnp.sum(d[c] * fp, axis=-1)
        if eflag:
            evdwl = evdwl + 0.5 * jnp.sum(jnp.where(mask, e, 0))
            if ec is not None:
                ecoul = ecoul + 0.5 * jnp.sum(jnp.where(mask, ec, 0))
        if vflag:
            virial = virial + 0.5 * jnp.stack([
                jnp.sum(fp * d[0] * d[0]), jnp.sum(fp * d[1] * d[1]),
                jnp.sum(fp * d[2] * d[2]), jnp.sum(fp * d[0] * d[1]),
                jnp.sum(fp * d[0] * d[2]), jnp.sum(fp * d[1] * d[2]),
            ])

    f = jnp.stack([c.reshape(-1) for c in fx], axis=1)
    if bond is not None:
        return (f, (evdwl if eflag else None),
                (ecoul if eflag else None), virial,
                (ebond if eflag else None))
    return (f, (evdwl if eflag else None),
            (ecoul if eflag else None), virial)


def displacement_exceeded(x, xhold, valid, box: Box, skin: float):
    from tpumd.core.state import minimum_image
    d = minimum_image(x - xhold, box)
    rsq = jnp.sum(d * d, axis=-1)
    rsq = jnp.where(valid, rsq, 0)
    delta = 0.5 * skin
    return jnp.max(rsq) > delta * delta
