"""fix rigid / rigid/nve: rigid-body time integration.

Reimplements FixRigid (src/RIGID/fix_rigid.cpp) for clusters of point
particles: bodies defined per molecule ID, per group, or a single body;
each body carries (xcm, vcm, quaternion, angmom) and its atoms are slaved
to the body frame every step (set_xv :1330 / set_v :1503).  The
integrator is the reference's velocity-Verlet on body DOF with the
Richardson quaternion update (src/math_extra.cpp richardson()).

TPU mapping: body reductions are ``segment_sum`` over a tag-space body
index (stable under the cell-grid engine's atom re-permutations); body
math is vectorized over a (B, ...) leading axis; per-atom slaving is a
(N,) gather from the small body tables.  Static body geometry (principal
inertia, body-frame displacements) is computed host-side in float64 at
setup (setup_bodies_static :1640) with ``numpy.linalg.eigh`` standing in
for the reference's Jacobi diagonalization (same principal frame up to
eigenvector sign, which the dynamics are invariant to).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpumd.md.fixes import Fix

EPSILON = 1.0e-7  # rigid_const.h:38 — zero-moment threshold


# --------------------------------------------------------------- quaternions
# vectorized ports of MathExtra (src/math_extra.cpp / .h), (B, ...) leading

def qnormalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def vecquat(a, b):
    """c = (0, a) * b for 3-vector a, quaternion b (math_extra.h:vecquat)."""
    c0 = -a[..., 0] * b[..., 1] - a[..., 1] * b[..., 2] - a[..., 2] * b[..., 3]
    c1 = b[..., 0] * a[..., 0] + a[..., 1] * b[..., 3] - a[..., 2] * b[..., 2]
    c2 = b[..., 0] * a[..., 1] + a[..., 2] * b[..., 1] - a[..., 0] * b[..., 3]
    c3 = b[..., 0] * a[..., 2] + a[..., 0] * b[..., 2] - a[..., 1] * b[..., 1]
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def quat_to_mat(q):
    """(B,4) -> (B,3,3) rotation matrix R with body axes as columns
    (math_extra.cpp quat_to_mat / q_to_exyz)."""
    w, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ex = jnp.stack([w * w + i * i - j * j - k * k,
                    2 * (i * j + w * k), 2 * (i * k - w * j)], axis=-1)
    ey = jnp.stack([2 * (i * j - w * k),
                    w * w - i * i + j * j - k * k,
                    2 * (j * k + w * i)], axis=-1)
    ez = jnp.stack([2 * (i * k + w * j), 2 * (j * k - w * i),
                    w * w - i * i - j * j + k * k], axis=-1)
    return jnp.stack([ex, ey, ez], axis=-1)   # columns = ex, ey, ez


def angmom_to_omega(m, rot, idiag):
    """w = R diag(1/I) R^T m, zero-moment components dropped
    (math_extra.cpp:259)."""
    wbody = jnp.einsum("...ji,...j->...i", rot, m)
    wbody = jnp.where(idiag == 0.0, 0.0, wbody / jnp.where(idiag == 0.0,
                                                           1.0, idiag))
    return jnp.einsum("...ij,...j->...i", rot, wbody)


def richardson(q, m, w, moments, dtq):
    """Richardson-extrapolated quaternion update (math_extra.cpp:100)."""
    wq = vecquat(w, q)
    qfull = qnormalize(q + dtq * wq)
    qhalf = qnormalize(q + 0.5 * dtq * wq)
    w2 = angmom_to_omega(m, quat_to_mat(qhalf), moments)  # mq_to_omega
    wq = vecquat(w2, qhalf)
    qhalf = qnormalize(qhalf + 0.5 * dtq * wq)
    return qnormalize(2.0 * qhalf - qfull)


def _exyz_to_q_np(e):
    """Host: rotation matrix (columns ex,ey,ez) -> quaternion
    (math_extra.cpp:328)."""
    ex, ey, ez = e[:, 0], e[:, 1], e[:, 2]
    q = np.zeros(4)
    q0sq = 0.25 * (ex[0] + ey[1] + ez[2] + 1.0)
    q1sq = q0sq - 0.5 * (ey[1] + ez[2])
    q2sq = q0sq - 0.5 * (ex[0] + ez[2])
    q3sq = q0sq - 0.5 * (ex[0] + ey[1])
    if q0sq >= 0.25:
        q[0] = np.sqrt(q0sq)
        q[1] = (ey[2] - ez[1]) / (4.0 * q[0])
        q[2] = (ez[0] - ex[2]) / (4.0 * q[0])
        q[3] = (ex[1] - ey[0]) / (4.0 * q[0])
    elif q1sq >= 0.25:
        q[1] = np.sqrt(q1sq)
        q[0] = (ey[2] - ez[1]) / (4.0 * q[1])
        q[2] = (ey[0] + ex[1]) / (4.0 * q[1])
        q[3] = (ex[2] + ez[0]) / (4.0 * q[1])
    elif q2sq >= 0.25:
        q[2] = np.sqrt(q2sq)
        q[0] = (ez[0] - ex[2]) / (4.0 * q[2])
        q[1] = (ey[0] + ex[1]) / (4.0 * q[2])
        q[3] = (ez[1] + ey[2]) / (4.0 * q[2])
    else:
        q[3] = np.sqrt(q3sq)
        q[0] = (ex[1] - ey[0]) / (4.0 * q[3])
        q[1] = (ez[0] + ex[2]) / (4.0 * q[3])
        q[2] = (ez[1] + ey[2]) / (4.0 * q[3])
    return q / np.linalg.norm(q)


@struct.dataclass
class RigidState:
    # dynamic body state
    xcm: jnp.ndarray        # (B,3) unwrapped center of mass
    vcm: jnp.ndarray        # (B,3)
    quat: jnp.ndarray       # (B,4)
    angmom: jnp.ndarray     # (B,3) space frame
    omega: jnp.ndarray      # (B,3) space frame
    virial: jnp.ndarray     # (6,) constraint-force virial this step
    # static body geometry (carried for permutation stability)
    inertia: jnp.ndarray    # (B,3) principal moments
    masstotal: jnp.ndarray  # (B,)
    body_tag: jnp.ndarray   # (T,) int32 body index per tag-1, -1 = free
    disp_tag: jnp.ndarray   # (T,3) body-frame displacement per tag-1


class FixRigid(Fix):
    """fix ID group rigid <single|molecule|group N g1..gN>.

    Point particles only (no finite-size/extended particles yet).
    Plain `rigid` and `rigid/nve` share this NVE body integrator
    (src/RIGID/fix_rigid_nve.cpp is FixRigid minus langevin extras).
    """

    name = "rigid"
    contributes_virial = True

    def __init__(self, style="molecule", groups=None):
        if style not in ("single", "molecule", "group"):
            raise ValueError(f"fix rigid style {style!r} not supported")
        self.style = style
        self.groups = groups or []
        self.nbody = 0
        self.dof_removed = 0

    def virial_contrib(self, fstate):
        return fstate.virial

    # ------------------------------------------------------------- setup
    def _body_assignment(self, sim, tag, sel, mol):
        """(T,) body index per tag-1 (-1 = not in a body)."""
        tmax = int(tag.max())
        body_tag = np.full(tmax, -1, np.int32)
        rows = np.nonzero(sel)[0]
        if self.style == "single":
            body_tag[tag[rows] - 1] = 0
            return body_tag, 1
        if self.style == "molecule":
            if mol is None:
                raise ValueError("fix rigid molecule requires molecule IDs")
            mids = np.unique(mol[rows])
            remap = {m: i for i, m in enumerate(mids)}
            body_tag[tag[rows] - 1] = np.array(
                [remap[m] for m in mol[rows]], np.int32)
            return body_tag, len(mids)
        # group style: one body per listed group
        gm = np.asarray(jax.device_get(sim.state.gmask))
        for i, g in enumerate(self.groups):
            bit = sim.groups[g]
            body_tag[tag[(gm & bit) > 0] - 1] = i
        return body_tag, len(self.groups)

    def init_state(self, s, ctx):
        sim = self._sim
        dt_ = s.x.dtype
        tag = np.asarray(jax.device_get(s.tag))
        valid = tag > 0
        x = np.asarray(jax.device_get(s.x), np.float64)
        v = np.asarray(jax.device_get(s.v), np.float64)
        img = np.asarray(jax.device_get(s.image), np.float64)
        gm = np.asarray(jax.device_get(s.gmask))
        mol = (np.asarray(jax.device_get(s.molecule))
               if s.molecule is not None else None)
        ell = np.asarray(jax.device_get(s.box.lengths), np.float64)
        xy, xz, yz = np.asarray(jax.device_get(s.box.tilt), np.float64)
        if s.rmass is not None:
            m = np.asarray(jax.device_get(s.rmass), np.float64)
        else:
            mass_t = np.asarray(sim.mass, np.float64)
            m = mass_t[np.clip(np.asarray(jax.device_get(s.type)), 0, None)]

        sel = valid & ((gm & self.groupbit) > 0 if self.groupbit != 1
                       else True)
        body_tag, nbody = self._body_assignment(sim, tag, sel, mol)
        self.nbody = nbody

        # unwrapped coords (Domain::unmap; triclinic adds tilt shifts)
        ux = x[:, 0] + img[:, 0] * ell[0] + img[:, 1] * xy + img[:, 2] * xz
        uy = x[:, 1] + img[:, 1] * ell[1] + img[:, 2] * yz
        uz = x[:, 2] + img[:, 2] * ell[2]
        u = np.stack([ux, uy, uz], axis=1)

        rows = np.nonzero(valid)[0]
        rows = rows[body_tag[tag[rows] - 1] >= 0]
        b = body_tag[tag[rows] - 1]
        mb, ub, vb = m[rows], u[rows], v[rows]

        masstotal = np.zeros(nbody)
        np.add.at(masstotal, b, mb)
        xcm = np.zeros((nbody, 3))
        np.add.at(xcm, b, mb[:, None] * ub)
        xcm /= masstotal[:, None]

        # inertia tensor per body (setup_bodies_static :1830)
        d = ub - xcm[b]
        it = np.zeros((nbody, 6))
        np.add.at(it, b, np.stack([
            mb * (d[:, 1] ** 2 + d[:, 2] ** 2),
            mb * (d[:, 0] ** 2 + d[:, 2] ** 2),
            mb * (d[:, 0] ** 2 + d[:, 1] ** 2),
            -mb * d[:, 1] * d[:, 2],
            -mb * d[:, 0] * d[:, 2],
            -mb * d[:, 0] * d[:, 1]], axis=1))
        inertia = np.zeros((nbody, 3))
        quat = np.zeros((nbody, 4))
        rot = np.zeros((nbody, 3, 3))
        nlinear = 0
        for ib in range(nbody):
            t = np.array([[it[ib, 0], it[ib, 5], it[ib, 4]],
                          [it[ib, 5], it[ib, 1], it[ib, 3]],
                          [it[ib, 4], it[ib, 3], it[ib, 2]]])
            evals, evecs = np.linalg.eigh(t)
            order = np.argsort(evals)[::-1]     # jacobi3 SORT_DECREASING
            evals, evecs = evals[order], evecs[:, order]
            mx = evals.max() if nbody else 1.0
            evals[evals < EPSILON * max(mx, 0.0)] = 0.0
            if (evals == 0.0).any():
                nlinear += 1
            # right-handed frame (flip ez if needed)
            if np.dot(np.cross(evecs[:, 0], evecs[:, 1]), evecs[:, 2]) < 0:
                evecs[:, 2] = -evecs[:, 2]
            inertia[ib] = evals
            rot[ib] = evecs
            quat[ib] = _exyz_to_q_np(evecs)

        # displace = body-frame coords (transpose_matvec)
        disp_tag = np.zeros((body_tag.shape[0], 3))
        disp_tag[tag[rows] - 1] = np.einsum("nji,nj->ni", rot[b], d)

        # vcm / angmom from current velocities (setup_bodies_dynamic :2159)
        vcm = np.zeros((nbody, 3))
        np.add.at(vcm, b, mb[:, None] * vb)
        vcm /= masstotal[:, None]
        angmom = np.zeros((nbody, 3))
        np.add.at(angmom, b, np.cross(d, mb[:, None] * vb))
        wbody = np.einsum("nji,nj->ni", rot, angmom)
        wbody = np.where(inertia == 0.0, 0.0,
                         wbody / np.where(inertia == 0.0, 1.0, inertia))
        omega = np.einsum("nij,nj->ni", rot, wbody)

        # DOF removed: 3N - 6 per full body, +1 per linear body (dof :1281)
        ncount = np.zeros(nbody, int)
        np.add.at(ncount, b, 1)
        self.dof_removed = int((3 * ncount - 6).sum() + nlinear)

        return RigidState(
            xcm=jnp.asarray(xcm, dt_), vcm=jnp.asarray(vcm, dt_),
            quat=jnp.asarray(quat, dt_), angmom=jnp.asarray(angmom, dt_),
            omega=jnp.asarray(omega, dt_),
            virial=jnp.zeros((6,), dt_),
            inertia=jnp.asarray(inertia, dt_),
            masstotal=jnp.asarray(masstotal, dt_),
            body_tag=jnp.asarray(body_tag, jnp.int32),
            disp_tag=jnp.asarray(disp_tag, dt_))

    # ---------------------------------------------------------- device path
    def _atom_body(self, s, fst):
        rows = jnp.clip(s.tag - 1, 0)
        body = jnp.where(s.tag > 0, fst.body_tag[rows], -1)
        disp = fst.disp_tag[rows]
        return body, disp

    def _unwrap(self, s):
        ell = s.box.lengths
        xy, xz, yz = s.box.tilt[0], s.box.tilt[1], s.box.tilt[2]
        img = s.image.astype(s.x.dtype)
        ux = s.x[:, 0] + img[:, 0] * ell[0] + img[:, 1] * xy + img[:, 2] * xz
        uy = s.x[:, 1] + img[:, 1] * ell[1] + img[:, 2] * yz
        uz = s.x[:, 2] + img[:, 2] * ell[2]
        return jnp.stack([ux, uy, uz], axis=1)

    def _fcm_torque(self, s, fst, body):
        """Per-body force + torque about xcm (compute_forces_and_torques
        :1021)."""
        nb = fst.xcm.shape[0]
        seg = jnp.where(body >= 0, body, nb)
        fcm = jax.ops.segment_sum(s.f, seg, num_segments=nb + 1)[:nb]
        arm = self._unwrap(s) - fst.xcm[jnp.clip(body, 0)]
        tq = jnp.cross(arm, s.f)
        tq = jnp.where((body >= 0)[:, None], tq, 0.0)
        torque = jax.ops.segment_sum(tq, seg, num_segments=nb + 1)[:nb]
        return fcm, torque

    def _slave_v(self, s, fst, body, disp):
        """Body-frame velocities for slaved atoms (set_v :1503)."""
        rot = quat_to_mat(fst.quat)
        delta = jnp.einsum("nij,nj->ni", rot[jnp.clip(body, 0)], disp)
        om = fst.omega[jnp.clip(body, 0)]
        vnew = jnp.cross(om, delta) + fst.vcm[jnp.clip(body, 0)]
        return delta, vnew

    def _virial_half(self, s, ctx, vnew, vold, body):
        """0.5 * unwrap(x) (x) f_constraint (set_xv virial tally :1414)."""
        dtf = 0.5 * ctx.dt * ctx.units.ftm2v
        m = ctx.mass_per_atom(s)[:, None]
        fc = jnp.where((body >= 0)[:, None],
                       m * (vnew - vold) / dtf - s.f, 0.0)
        u = self._unwrap(s)
        return 0.5 * jnp.stack([
            jnp.sum(u[:, 0] * fc[:, 0]), jnp.sum(u[:, 1] * fc[:, 1]),
            jnp.sum(u[:, 2] * fc[:, 2]), jnp.sum(u[:, 0] * fc[:, 1]),
            jnp.sum(u[:, 0] * fc[:, 2]), jnp.sum(u[:, 1] * fc[:, 2])])

    def setup_post_force(self, s, fstate, ctx, xin=None):
        """FixRigid::setup :783 — project velocities onto body modes and
        guesstimate the constraint virial as 2x the set_v half."""
        body, disp = self._atom_body(s, fstate)
        rot = quat_to_mat(fstate.quat)
        omega = angmom_to_omega(fstate.angmom, rot, fstate.inertia)
        fstate = fstate.replace(omega=omega)
        _, vnew = self._slave_v(s, fstate, body, disp)
        vhalf = self._virial_half(s, ctx, vnew, s.v, body)
        v = jnp.where((body >= 0)[:, None], vnew, s.v)
        return s.replace(v=v), fstate.replace(virial=2.0 * vhalf)

    def initial_integrate(self, s, fstate, ctx):
        fst = fstate
        body, disp = self._atom_body(s, fst)
        dtf = 0.5 * ctx.dt * ctx.units.ftm2v
        dtq = 0.5 * ctx.dt
        fcm, torque = self._fcm_torque(s, fst, body)

        vcm = fst.vcm + (dtf / fst.masstotal)[:, None] * fcm
        xcm = fst.xcm + ctx.dt * vcm
        angmom = fst.angmom + dtf * torque
        rot = quat_to_mat(fst.quat)
        omega = angmom_to_omega(angmom, rot, fst.inertia)
        quat = richardson(fst.quat, angmom, omega, fst.inertia, dtq)
        rot = quat_to_mat(quat)
        # omega after richardson = mq_to_omega at the half step (the
        # reference's w argument is updated in place)
        omega = angmom_to_omega(angmom, rot, fst.inertia)
        fst = fst.replace(vcm=vcm, xcm=xcm, angmom=angmom, quat=quat,
                          omega=omega)

        # set_xv :1330 — slave atom coords/velocities to the body frame
        bidx = jnp.clip(body, 0)
        delta = jnp.einsum("nij,nj->ni", rot[bidx], disp)
        vnew = jnp.cross(fst.omega[bidx], delta) + vcm[bidx]
        u_new = delta + xcm[bidx]
        ell = s.box.lengths
        xy, xz, yz = s.box.tilt[0], s.box.tilt[1], s.box.tilt[2]
        img = s.image.astype(s.x.dtype)
        shift = jnp.stack([img[:, 0] * ell[0] + img[:, 1] * xy
                           + img[:, 2] * xz,
                           img[:, 1] * ell[1] + img[:, 2] * yz,
                           img[:, 2] * ell[2]], axis=1)
        xnew = u_new - shift

        inbody = (body >= 0)[:, None]
        # virial tally uses the PRE-set_xv unwrapped coords (set_xv :1369)
        vhalf = self._virial_half(s, ctx, vnew, s.v, body)
        s = s.replace(x=jnp.where(inbody, xnew, s.x),
                      v=jnp.where(inbody, vnew, s.v))
        return s, fst.replace(virial=vhalf)

    def final_integrate(self, s, fstate, ctx):
        fst = fstate
        body, disp = self._atom_body(s, fst)
        dtf = 0.5 * ctx.dt * ctx.units.ftm2v
        fcm, torque = self._fcm_torque(s, fst, body)
        vcm = fst.vcm + (dtf / fst.masstotal)[:, None] * fcm
        angmom = fst.angmom + dtf * torque
        rot = quat_to_mat(fst.quat)
        omega = angmom_to_omega(angmom, rot, fst.inertia)
        fst = fst.replace(vcm=vcm, angmom=angmom, omega=omega)

        _, vnew = self._slave_v(s, fst, body, disp)
        vhalf = self._virial_half(s, ctx, vnew, s.v, body)
        v = jnp.where((body >= 0)[:, None], vnew, s.v)
        return s.replace(v=v), fst.replace(virial=fst.virial + vhalf)
