"""Core simulation state pytrees.

TPU-native replacement for the reference's Atom/Domain data model
(src/atom.h:40-230, src/domain.h): per-atom quantities are fixed-capacity
SoA ``jnp`` arrays living in HBM; the box is a small struct carried in the
same pytree so barostats can update it under jit.

All arrays are padded to a static capacity ``N`` with a validity count
``nlocal`` (scalar). For single-chip runs capacity == natoms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Box:
    """Orthogonal (optionally tilted) simulation box.

    lo, hi: (3,) box bounds. tilt: (3,) = (xy, xz, yz) for triclinic;
    zeros for orthogonal (reference: src/domain.h).  ``periodic`` is a
    static per-dim flag (non-periodic dims are never wrapped and get no
    minimum-image correction; reference Domain boundary styles f/s).
    """

    lo: jnp.ndarray
    hi: jnp.ndarray
    tilt: jnp.ndarray                 # (xy, xz, yz)
    periodic: tuple = struct.field(pytree_node=False,
                                   default=(True, True, True))
    # static flag: kernels trace different code for skewed cells
    istriclinic: bool = struct.field(pytree_node=False, default=False)

    @property
    def lengths(self) -> jnp.ndarray:
        return self.hi - self.lo

    @property
    def volume(self) -> jnp.ndarray:
        ell = self.lengths
        return ell[0] * ell[1] * ell[2]

    @staticmethod
    def orthogonal(lo, hi, dtype=None, periodic=(True, True, True)):
        lo = jnp.asarray(lo, dtype=dtype)
        hi = jnp.asarray(hi, dtype=dtype)
        return Box(lo=lo, hi=hi, tilt=jnp.zeros((3,), dtype=lo.dtype),
                   periodic=tuple(periodic))

    @staticmethod
    def triclinic(lo, hi, tilt, dtype=None, periodic=(True, True, True)):
        lo = jnp.asarray(lo, dtype=dtype)
        return Box(lo=lo, hi=jnp.asarray(hi, dtype=dtype),
                   tilt=jnp.asarray(tilt, dtype=lo.dtype),
                   periodic=tuple(periodic), istriclinic=True)

    # -- triclinic transforms (Domain::x2lamda/lamda2x, src/domain.cpp) --
    def x2lamda(self, x):
        ell = self.lengths
        xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
        d = x - self.lo
        lz = d[..., 2] / ell[2]
        ly = (d[..., 1] - yz * lz) / ell[1]
        lx = (d[..., 0] - xy * ly - xz * lz) / ell[0]
        return jnp.stack([lx, ly, lz], axis=-1)

    def lamda2x(self, lam):
        ell = self.lengths
        xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
        x = ell[0] * lam[..., 0] + xy * lam[..., 1] + xz * lam[..., 2]
        y = ell[1] * lam[..., 1] + yz * lam[..., 2]
        z = ell[2] * lam[..., 2]
        return jnp.stack([x, y, z], axis=-1) + self.lo

    def perp_widths(self):
        """Perpendicular box widths (numpy, host): V / face areas —
        the triclinic analog of the lengths for cell-count selection."""
        import numpy as onp
        ell = onp.asarray(jax.device_get(self.lengths), onp.float64)
        xy, xz, yz = onp.asarray(jax.device_get(self.tilt), onp.float64)
        a = onp.array([ell[0], 0, 0])
        b = onp.array([xy, ell[1], 0])
        c = onp.array([xz, yz, ell[2]])
        vol = ell[0] * ell[1] * ell[2]
        return onp.array([vol / onp.linalg.norm(onp.cross(b, c)),
                          vol / onp.linalg.norm(onp.cross(a, c)),
                          vol / onp.linalg.norm(onp.cross(a, b))])


def minimum_image_c(dc, box: Box, c: int):
    """Per-component minimum image (for kernels on (N, K) component
    arrays — full-lane VPU tiling instead of 3/128)."""
    assert not box.istriclinic, "use minimum_image for triclinic boxes"
    if not box.periodic[c]:
        return dc
    ell = box.lengths[c]
    return dc - ell * jnp.round(dc / ell)


def minimum_image(d, box: Box):
    """Nearest-image displacement correction, skipping non-periodic dims.

    Triclinic: sequential z/y/x corrections including tilt carries
    (Domain::minimum_image, src/domain.cpp — valid for tilts within the
    standard half-box bound)."""
    ell = box.lengths
    if box.istriclinic:
        xy, xz, yz = box.tilt[0], box.tilt[1], box.tilt[2]
        dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
        if box.periodic[2]:
            nz = jnp.round(dz / ell[2])
            dz = dz - ell[2] * nz
            dy = dy - yz * nz
            dx = dx - xz * nz
        if box.periodic[1]:
            ny = jnp.round(dy / ell[1])
            dy = dy - ell[1] * ny
            dx = dx - xy * ny
        if box.periodic[0]:
            dx = dx - ell[0] * jnp.round(dx / ell[0])
        return jnp.stack([dx, dy, dz], axis=-1)
    corr = ell * jnp.round(d / ell)
    if all(box.periodic):
        return d - corr
    pmask = jnp.asarray([1.0 if p else 0.0 for p in box.periodic],
                        dtype=d.dtype)
    return d - corr * pmask


@struct.dataclass
class MDState:
    """Per-atom dynamical state + box (the integration variables)."""

    x: jnp.ndarray       # (N, 3) positions
    v: jnp.ndarray       # (N, 3) velocities
    f: jnp.ndarray       # (N, 3) forces
    type: jnp.ndarray    # (N,) int32, 1-based type ids (0 = padding)
    tag: jnp.ndarray     # (N,) int32 global atom ids (1-based; 0 = padding)
    image: jnp.ndarray   # (N, 3) int32 periodic image flags
    box: Box
    nlocal: jnp.ndarray  # scalar int32: number of valid atoms
    # group membership bitmask (bit 0 = "all"), reference atom->mask
    gmask: jnp.ndarray | None = None     # (N,) int32
    # optional per-atom fields (None when the atom style doesn't carry them)
    q: jnp.ndarray | None = None         # charge
    molecule: jnp.ndarray | None = None  # molecule id
    # sphere atom style (src/atom_vec_sphere.cpp): finite-size particles
    radius: jnp.ndarray | None = None    # (N,)
    rmass: jnp.ndarray | None = None     # (N,) per-atom mass
    omega: jnp.ndarray | None = None     # (N, 3) angular velocity
    torque: jnp.ndarray | None = None    # (N, 3) torque accumulator
    # special 1-2/1-3/1-4 neighbor lists (tags + weight codes), carried as
    # per-atom state so they permute with the atoms AND stay out of
    # compiled graphs as baked constants (large-topology compile times)
    special_tags: jnp.ndarray | None = None   # (N, S) int32, 0-padded
    special_codes: jnp.ndarray | None = None  # (N, S) int32 1/2/3
    # in-kernel 2-body bonds (cell-grid fast path): per-atom partner tags
    # and bond types, matched against rolled candidate tags exactly like
    # the special lists — bond forces then cost zero gathers per step
    bond_tags: jnp.ndarray | None = None      # (N, B) int32, 0-padded
    bond_btypes: jnp.ndarray | None = None    # (N, B) int32
    # registry-declared per-atom fields beyond the named ones above
    # (AtomVec field registry, tpumd/core/atomvec.py): a dict pytree —
    # values permute/pad/restart with the atoms via map_per_atom
    extras: dict = struct.field(default_factory=dict)

    @property
    def capacity(self) -> int:
        return self.x.shape[0]


# every per-atom array field of MDState (for generic permute/pad/compact)
PER_ATOM_FIELDS = ("x", "v", "f", "type", "tag", "image", "gmask", "q",
                   "molecule", "radius", "rmass", "omega", "torque",
                   "special_tags", "special_codes",
                   "bond_tags", "bond_btypes")


def iter_per_atom(state: MDState):
    """(key, array) pairs over every present per-atom field, including
    registry extras (keys prefixed "extras:")."""
    out = []
    for name in PER_ATOM_FIELDS:
        a = getattr(state, name)
        if a is not None:
            out.append((name, a))
    for k in sorted(state.extras):
        out.append((f"extras:{k}", state.extras[k]))
    return out


def replace_per_atom(state: MDState, updates: dict) -> MDState:
    """Inverse of iter_per_atom: apply {key: new array}."""
    named = {k: v for k, v in updates.items() if not k.startswith("extras:")}
    ex = {k[7:]: v for k, v in updates.items() if k.startswith("extras:")}
    if ex:
        named["extras"] = {**state.extras, **ex}
    return state.replace(**named)


def map_per_atom(state: MDState, fn) -> MDState:
    """Apply fn(array) to every non-None per-atom field."""
    updates = {}
    for name in PER_ATOM_FIELDS:
        a = getattr(state, name)
        if a is not None:
            updates[name] = fn(a)
    if state.extras:
        updates["extras"] = {k: fn(v) for k, v in state.extras.items()}
    return state.replace(**updates)


def make_state(x, v, types, box: Box, *, tags=None, q=None, molecule=None,
               radius=None, rmass=None, omega=None, image=None,
               extras=None, dtype=jnp.float64) -> MDState:
    """Build an MDState from host arrays (no padding).

    extras: {name: host array} of registry-declared per-atom fields
    beyond the named ones (AtomVec field registry, core/atomvec.py)."""
    n = x.shape[0]
    x = jnp.asarray(x, dtype=dtype)
    v = jnp.asarray(v, dtype=dtype)
    if tags is None:
        tags = np.arange(1, n + 1, dtype=np.int32)
    sphere = radius is not None
    return MDState(
        x=x,
        v=v,
        f=jnp.zeros_like(x),
        type=jnp.asarray(types, dtype=jnp.int32),
        tag=jnp.asarray(tags, dtype=jnp.int32),
        image=(jnp.zeros((n, 3), dtype=jnp.int32) if image is None
               else jnp.asarray(image, dtype=jnp.int32)),
        box=Box(lo=box.lo.astype(dtype), hi=box.hi.astype(dtype),
                tilt=box.tilt.astype(dtype), periodic=box.periodic,
                istriclinic=box.istriclinic),
        nlocal=jnp.asarray(n, dtype=jnp.int32),
        gmask=jnp.ones((n,), dtype=jnp.int32),
        q=None if q is None else jnp.asarray(q, dtype=dtype),
        molecule=None if molecule is None else jnp.asarray(molecule, dtype=jnp.int32),
        radius=None if radius is None else jnp.asarray(radius, dtype=dtype),
        rmass=None if rmass is None else jnp.asarray(rmass, dtype=dtype),
        omega=(jnp.zeros_like(x) if sphere and omega is None
               else None if omega is None else jnp.asarray(omega, dtype=dtype)),
        torque=jnp.zeros_like(x) if sphere else None,
        extras={} if not extras else {
            k: jnp.asarray(a, jnp.int32 if np.issubdtype(
                np.asarray(a).dtype, np.integer) else dtype)
            for k, a in extras.items()},
    )


@jax.jit
def wrap_pbc(state: MDState) -> MDState:
    """Remap atoms into the periodic box, updating image flags.

    Equivalent of Domain::pbc (src/domain.cpp) for orthogonal boxes, called
    at reneighbor steps.  Non-periodic dims are left unwrapped.

    Jitted: the setup path calls it eagerly, and on the remote-TPU link
    every eager op pays a ~0.5 s AOT compile round trip.
    """
    box = state.box
    if box.istriclinic:
        lam = box.x2lamda(state.x)
        shift = jnp.floor(lam).astype(jnp.int32)
        if not all(box.periodic):
            pmask = jnp.asarray([1 if p else 0 for p in box.periodic],
                                dtype=jnp.int32)
            shift = shift * pmask
        x = box.lamda2x(lam - shift.astype(lam.dtype))
        return state.replace(x=x, image=state.image + shift)
    ell = box.lengths
    rel = (state.x - box.lo) / ell
    shift = jnp.floor(rel).astype(jnp.int32)
    if not all(box.periodic):
        pmask = jnp.asarray([1 if p else 0 for p in box.periodic],
                            dtype=jnp.int32)
        shift = shift * pmask
    x = state.x - shift * ell
    return state.replace(x=x, image=state.image + shift)
