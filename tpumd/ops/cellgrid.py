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

    @property
    def ncells(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def capacity(self) -> int:
        return self.ncells * self.cap

    def stencil(self):
        def offs(n):
            return (-1, 0, 1) if n >= 3 else ((0, -1) if n == 2 else (0,))
        return [(dx, dy, dz) for dz in offs(self.nz)
                for dy in offs(self.ny) for dx in offs(self.nx)]


@struct.dataclass
class CellGridState:
    valid: jnp.ndarray      # (Np,) bool — slot holds a real atom
    xhold: jnp.ndarray      # (Np, 3) positions at last build
    ago: jnp.ndarray
    nbuilds: jnp.ndarray
    overflow: jnp.ndarray
    max_count: jnp.ndarray  # max atoms seen in one cell


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
        cap = int(np.ceil((mean * 1.45 + 4) / 8) * 8)
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


def apply_permutation(state: MDState, perm, valid_new) -> MDState:
    """Reorder all per-atom arrays into grid-slot order (capacity Np)."""
    from tpumd.core.state import map_per_atom
    idx = jnp.maximum(perm, 0)

    def take(a):
        out = jnp.take(a, idx, axis=0)
        mask = valid_new.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(mask, out, 0)

    return map_per_atom(state, take)


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


def _offs(n: int):
    return (-1, 0, 1) if n >= 3 else ((0, -1) if n == 2 else (0,))


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
                       special=None):
    """Forces/energy/virial via rolled dense cell-pair blocks.

    The x-direction stencil is folded into a 3*cap-wide j-row (one concat),
    so only the y/z offsets are looped: 9 shifts of (cap, 3cap) blocks.
    Periodic wrap handled by per-cell coordinate corrections at roll time.

    special: optional (tag (Np,), special_tags (Np,S), special_codes
    (Np,S), special_lj (4,)) — 1-2/1-3/1-4 pair weighting resolved
    in-kernel by comparing each candidate's rolled tag against the i
    slot's special list (the grid analog of the matrix path's sbits;
    reference SBBITS packing, src/npair_half_bin_newton.cpp:114).
    """
    cap = cfg.cap
    gshape = (cfg.nz, cfg.ny, cfg.nx, cap)
    dtype = x.dtype

    xg = [x[:, c].reshape(gshape) for c in range(3)]
    tg = type_.reshape(gshape)
    vg = valid.reshape(gshape)

    # --- fold the x stencil into a row: (nz, ny, nx, len(xoffs)*cap) -----
    xoffs = _offs(cfg.nx)
    Lx, Ly, Lz = box.lengths[0], box.lengths[1], box.lengths[2]

    def xrow(a, corr):
        return jnp.concatenate(
            [_roll_nbr(a, o, 2, corr) for o in xoffs], axis=-1)

    rows = [xrow(xg[0], Lx), xrow(xg[1], None), xrow(xg[2], None)]
    trow = xrow(tg, None)
    vrow = xrow(vg, None)
    rowlen = len(xoffs) * cap
    if special is not None:
        atag, stags, scodes, w_lj = special
        atag_g = atag.reshape(gshape)
        tagrow = xrow(atag_g, None)
        S = stags.shape[1]
        stags_g = stags.reshape(gshape + (S,))
        scodes_g = scodes.reshape(gshape + (S,))

    # self-exclusion: in the zero y/z shift, slot j == own slot within the
    # o=0 segment of the row
    zero_seg = xoffs.index(0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cap, rowlen), 1)
    not_self = jj != ii + zero_seg * cap

    fx = [jnp.zeros(gshape, dtype) for _ in range(3)]
    evdwl = jnp.zeros((), dtype)
    ecoul = jnp.zeros((), dtype)
    virial = jnp.zeros((6,), dtype) if vflag else None

    for dz in _offs(cfg.nz):
        for dy in _offs(cfg.ny):
            xj = []
            for comp in range(3):
                a = _roll_nbr(rows[comp], dz, 0, Lz if comp == 2 else None)
                a = _roll_nbr(a, dy, 1, Ly if comp == 1 else None)
                xj.append(a)
            tj = _roll_nbr(_roll_nbr(trow, dz, 0, None), dy, 1, None)
            vj = _roll_nbr(_roll_nbr(vrow, dz, 0, None), dy, 1, None)

            # (nz, ny, nx, cap_i, rowlen) pair blocks
            d = [xg[c][..., :, None] - xj[c][..., None, :] for c in range(3)]
            r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            mask = vg[..., :, None] & vj[..., None, :]
            if dz == 0 and dy == 0:
                mask = mask & not_self
            r2 = jnp.where(mask, r2, jnp.ones_like(r2))

            fp, e, ec, fcoul = pair_fn(
                r2, tg[..., :, None], tj[..., None, :])
            if fcoul is not None:
                fp = fp + fcoul
            if special is not None:
                tagj = _roll_nbr(_roll_nbr(tagrow, dz, 0, None), dy, 1, None)
                code = jnp.zeros(mask.shape, jnp.int32)
                for si in range(S):
                    sti = stags_g[..., :, si:si + 1]      # (..., cap, 1)
                    hit = (sti > 0) & (sti == tagj[..., None, :])
                    code = jnp.maximum(
                        code, jnp.where(hit, scodes_g[..., :, si:si + 1], 0))
                # 4-entry select as nested wheres (a gather here would
                # dominate the whole kernel)
                w = jnp.where(
                    code == 1, w_lj[1],
                    jnp.where(code == 2, w_lj[2],
                              jnp.where(code == 3, w_lj[3],
                                        w_lj[0]))).astype(dtype)
                fp = fp * w
                if eflag:
                    e = e * w
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
    return (f, (evdwl if eflag else None),
            (ecoul if eflag else None), virial)


def displacement_exceeded(x, xhold, valid, box: Box, skin: float):
    from tpumd.core.state import minimum_image
    d = minimum_image(x - xhold, box)
    rsq = jnp.sum(d * d, axis=-1)
    rsq = jnp.where(valid, rsq, 0)
    delta = 0.5 * skin
    return jnp.max(rsq) > delta * delta
