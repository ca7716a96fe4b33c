"""fix external: forces supplied by an external driver program.

Reimplements src/fix_external.cpp: a per-atom force array ``fexternal``
owned by the driver is added to f in post_force.  Two modes:

- ``pf/array Napply``: the driver writes the force array between run()
  calls (lammps_fix_external_get_force); forces apply on steps where
  ntimestep %% Napply == 0.
- ``pf/callback Ncall Napply``: a host callback fires DURING the step,
  after forces are computed but before post_force/final_integrate, on
  steps where ntimestep %% Ncall == 0 — exactly the reference's timing
  (src/fix_external.cpp:141-176).  The run loop realizes this by
  splitting those steps into a compiled pre-half and post-half around
  the host call (tpumd/md/verlet.py run_step_split); other steps run in
  normal compiled segments.

The callback receives (timestep, x (N,3) tag-ordered? no — INTERNAL row
order, like the reference's local order, ids (N,), f_out (N,3) to fill).
The driver may also set a global energy/virial contribution
(lammps_fix_external_set_energy_global), tallied into thermo.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpumd.md.fixes import Fix


class FixExternal(Fix):
    name = "external"
    needs_step = True
    thermo_scalar = True
    contributes_virial = True
    # the driver's force buffer is indexed by atom row: require the
    # matrix engine's stable row order (cellgrid permutes rows per rebuild)
    forces_matrix_engine = True

    def __init__(self, mode: str, ncall: int = 1, napply: int = 1):
        if mode not in ("pf/callback", "pf/array"):
            raise ValueError(f"fix external: unknown mode {mode!r}")
        self.mode = mode
        self.ncall = int(ncall)
        self.napply = int(napply)
        if self.ncall <= 0 or self.napply <= 0:
            raise ValueError("Illegal fix external command")
        self.callback = None        # python callable(step, x, ids, fext)
        self.energy_global = 0.0
        self.virial_global = np.zeros(6)
        self._fext_host = None      # numpy staging buffer for the driver
        # driver-supplied per-atom tallies + global vector
        # (src/fix_external.cpp set_energy_peratom/set_virial_peratom/
        # set_vector_length/set_vector)
        self.energy_peratom = None   # (N,) tag-order doubles
        self.virial_peratom = None   # (N, 6)
        self._vector = None          # global vector for extract_fix

    # ------------------------------------------------------------ state
    def init_state(self, s, ctx):
        # (timestep, fexternal, user_virial) ride the carry
        return (jnp.zeros((), jnp.int32), jnp.zeros_like(s.x),
                jnp.zeros((6,), s.x.dtype))

    def set_step(self, fstate, istep):
        return (istep,) + tuple(fstate[1:])

    def host_force_buffer(self, sim):
        """Driver-visible numpy force buffer (pf/array mode); pushed to
        the device by sync_array before the next run."""
        if self._fext_host is None or \
                self._fext_host.shape[0] != sim.state.x.shape[0]:
            self._fext_host = np.zeros(
                (sim.state.x.shape[0], 3), dtype=np.float64)
        return self._fext_host

    def _push(self, sim, fext_new, patch_force: bool):
        """Store a new force fill (+ user virial) into the fix state.
        When ``patch_force`` (run-start/setup), also swap the external
        contribution inside the carried force so the next half-kick sees
        the new fill — the reference re-runs post_force in Verlet::setup
        each run command (src/fix_external.cpp:110-113)."""
        i = sim.fixes.index(self)
        c = sim._carry
        s = c[0]
        fstates = list(c[2])
        step, fext_old, _ = fstates[i]
        fext_new = jnp.asarray(fext_new, dtype=s.x.dtype)
        vir = jnp.asarray(self.virial_global, dtype=s.x.dtype)
        fstates[i] = (step, fext_new, vir)
        if patch_force and sim.step % self.napply == 0:
            sel = self.group_sel(s)[:, None]
            s = s.replace(f=s.f + jnp.where(sel, fext_new - fext_old, 0))
        sim._carry = (s, c[1], tuple(fstates)) + tuple(c[3:])

    def sync_array(self, sim):
        """Copy the host force buffer + user virial into the fix state
        (called by run() before each segment)."""
        if self._fext_host is None and not np.any(self.virial_global):
            return
        fext = (self._fext_host if self._fext_host is not None
                else sim._carry[2][sim.fixes.index(self)][1])
        self._push(sim, fext, patch_force=True)

    # --------------------------------------------------------- in-step
    def post_force(self, s, fstate, ctx, xin=None):
        step, fext, _ = fstate
        apply_now = (step % self.napply) == 0
        sel = self.group_sel(s)[:, None] & apply_now
        f = s.f + jnp.where(sel, fext, 0)
        return s.replace(f=f), fstate

    def virial_contrib(self, fstate):
        step, _, vir = fstate
        return jnp.where((step % self.napply) == 0, vir, 0.0)

    # ------------------------------------------------------ host side
    def invoke_callback(self, sim, timestep: int, at_setup: bool = False):
        """Host callback at a % ncall == 0 step: runs mid-step with the
        freshly updated positions, then stores the returned forces into
        the fix state for this step's post_force.  ``at_setup``: run-start
        invocation (Verlet::setup) — also patch the carried force, since
        no post_force will run before the next half-kick."""
        if self.callback is None:
            return
        import jax
        s = sim._carry[0]
        x = np.asarray(jax.device_get(s.x), dtype=np.float64)
        ids = np.asarray(jax.device_get(s.tag))
        fext = np.zeros_like(x)
        self.callback(int(timestep), x, ids, fext)
        self._push(sim, fext, patch_force=at_setup)

    def scalar(self, sim):
        """fix_modify energy contribution (compute_scalar)."""
        return self.energy_global

    def set_vector_length(self, n: int):
        """Declare the caller-provided global vector's length BEFORE any
        set_vector call (lammps_fix_external_set_vector_length)."""
        self._vector = np.zeros(int(n), dtype=np.float64)

    def set_vector(self, idx: int, val: float):
        """1-based element store (lammps_fix_external_set_vector)."""
        if self._vector is None:
            raise ValueError("fix external: set_vector before "
                             "set_vector_length")
        if not 1 <= idx <= self._vector.shape[0]:
            raise IndexError(f"fix external vector index {idx} out of "
                             f"range 1..{self._vector.shape[0]}")
        self._vector[idx - 1] = float(val)

    @property
    def vector(self):
        return self._vector
