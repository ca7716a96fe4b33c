"""Host-side simulation orchestrator.

Plays the role of the reference's LAMMPS composition root + Update + Run +
Thermo (src/lammps.cpp:811-851, src/run.cpp, src/thermo.cpp): owns the
styles, fixes and state, segments the run between thermo outputs, and runs
each segment as one compiled scan on device.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.core.state import MDState, wrap_pbc
from tpumd.md import computes
from tpumd.md.verlet import StepContext, eval_energies, run_segment
from tpumd.ops import neighbor as nb
from tpumd.utils.units import Units, get_units


class Simulation:
    def __init__(self, units: str = "lj", dtype=jnp.float64):
        self.units: Units = get_units(units)
        self.dtype = dtype
        self.dt = self.units.dt
        self.skin = self.units.skin
        self.neigh_every = 1
        self.neigh_delay = 10
        self.neigh_check = True
        self.bin_style = "bin"

        self.state: MDState | None = None
        self.mass = None               # (ntypes+1,) numpy
        self.ntypes = 0
        self.pair = None
        self.bonded: list = []
        self.kspace = None
        self.fixes: list = []
        self.special_lj = None         # (4,) or None
        self.special_coul = None
        self.special_tags = None
        self.special_codes = None

        self.thermo_every = 0          # 0: only first/last
        self.thermo_style = ["step", "temp", "epair", "emol", "etotal", "press"]
        self.thermo_norm = units == "lj"
        self.log_lines: list[str] = []
        self.dimension = 3

        self._ctx: StepContext | None = None
        self._carry = None
        self._neigh_cfg: nb.NeighborConfig | None = None
        self.step = 0
        self.last_thermo: dict | None = None
        self.loop_time = 0.0
        self.loop_steps = 0

    # ------------------------------------------------------------------ setup
    @property
    def natoms(self) -> int:
        return int(self.state.x.shape[0]) if self.state is not None else 0

    def mass_per_atom_np(self):
        return self.mass[np.asarray(jax.device_get(self.state.type))]

    def dof(self) -> float:
        extra = self.dimension
        fix_dof = sum(fx.dof_removed for fx in self.fixes)
        return self.dimension * self.natoms - extra - fix_dof

    def max_cutoff(self) -> float:
        cut = self.pair.max_cutoff if self.pair is not None else 0.0
        return cut

    def _make_ctx(self) -> StepContext:
        cutneigh = self.max_cutoff() + self.skin
        cfg = nb.choose_config(
            self.state.box, cutneigh, self.skin, self.natoms,
            every=self.neigh_every, delay=self.neigh_delay,
            check=self.neigh_check,
            has_special=self.special_tags is not None,
            kmax=getattr(self, "_kmax_override", None),
        )
        self._neigh_cfg = cfg
        mass_table = jnp.asarray(self.mass, dtype=self.dtype)
        sl = None if self.special_lj is None else jnp.asarray(
            self.special_lj, dtype=self.dtype)
        sc = None if self.special_coul is None else jnp.asarray(
            self.special_coul, dtype=self.dtype)
        st = None if self.special_tags is None else jnp.asarray(
            self.special_tags, dtype=jnp.int32)
        scod = None if self.special_codes is None else jnp.asarray(
            self.special_codes, dtype=jnp.int32)
        return StepContext(
            units=self.units, dt=self.dt, neigh_cfg=cfg,
            pair=self.pair, bonded=tuple(self.bonded), kspace=self.kspace,
            fixes=tuple(self.fixes), mass_table=mass_table,
            special_lj=sl, special_coul=sc,
            special_tags=st, special_codes=scod,
        )

    def setup(self):
        """Initial neighbor build + force evaluation (Verlet::setup)."""
        if self.pair is not None:
            self.pair.init()
        for b in self.bonded:
            b.init()
        if self.kspace is not None:
            self.kspace.init(self)
        self._ctx = self._make_ctx()
        ctx = self._ctx

        s = wrap_pbc(self.state)
        idx, sbits, max_count, over = nb.build_neighbors(
            s.x, s.box, ctx.neigh_cfg,
            special_tags=ctx.special_tags, special_codes=ctx.special_codes,
            tag=s.tag)
        neigh = nb.NeighborState(
            idx=idx, sbits=sbits, xhold=s.x,
            ago=jnp.zeros((), jnp.int32), nbuilds=jnp.ones((), jnp.int32),
            overflow=over, max_count=max_count)
        self._check_overflow(neigh)

        f, energies, virial = eval_energies(s, neigh, ctx)
        s = s.replace(f=f)
        fstates = tuple(fx.init_state(s, ctx) for fx in self.fixes)
        self._carry = (s, neigh, fstates, jnp.asarray(self.step, jnp.int32))
        self.state = s
        self._last_energies = energies
        self._last_virial = virial

    def _check_overflow(self, neigh):
        if bool(jax.device_get(neigh.overflow)):
            raise RuntimeError(
                "neighbor-list overflow: "
                f"max_count={int(jax.device_get(neigh.max_count))} "
                f"kmax={self._neigh_cfg.kmax} cell_cap={self._neigh_cfg.cell_cap}")

    # ------------------------------------------------------------------ run
    def run(self, nsteps: int):
        if self._ctx is None:
            self.setup()
        ctx = self._ctx
        self._thermo_header()
        self._thermo_line()  # setup thermo at current step

        target = self.step + nsteps
        t0 = time.perf_counter()
        while self.step < target:
            if self.thermo_every > 0:
                nxt = min(target,
                          (self.step // self.thermo_every + 1) * self.thermo_every)
            else:
                nxt = target
            seg = nxt - self.step
            snapshot = self._carry
            carry = run_segment(self._carry, ctx, seg)
            s, neigh, fstates, istep = carry
            if bool(jax.device_get(neigh.overflow)):
                # grow capacities and redo the segment from the snapshot
                self._kmax_override = int(self._neigh_cfg.kmax * 1.5 + 8)
                old_neigh_state = snapshot[1]
                self._ctx = ctx = self._make_ctx()
                s0 = snapshot[0]
                idx, sbits, max_count, over = nb.build_neighbors(
                    wrap_pbc(s0).x, s0.box, ctx.neigh_cfg,
                    special_tags=ctx.special_tags,
                    special_codes=ctx.special_codes, tag=s0.tag)
                neigh0 = old_neigh_state.replace(
                    idx=idx, sbits=sbits, max_count=max_count,
                    overflow=over)
                self._check_overflow(neigh0)
                self._carry = (s0, neigh0, snapshot[2], snapshot[3])
                continue
            self._carry = carry
            self.state = s
            self.step = nxt
            f, energies, virial = eval_energies(s, neigh, ctx)
            self._last_energies = energies
            self._last_virial = virial
            self._thermo_line()
        jax.block_until_ready(self._carry[0].x)
        self.loop_time += time.perf_counter() - t0
        self.loop_steps += nsteps

    # ------------------------------------------------------------------ thermo
    def thermo_values(self) -> dict:
        s, neigh, fstates, _ = self._carry
        e = {k: float(jax.device_get(v)) for k, v in self._last_energies.items()}
        u = self.units
        dof = self.dof()
        mass_pa = jnp.asarray(self.mass, self.dtype)[s.type]
        t = float(jax.device_get(
            computes.temperature(s.v, mass_pa, dof, u.boltz, u.mvv2e)))
        ke = computes.kinetic_energy(t, dof, u.boltz)
        vol = float(jax.device_get(s.box.volume))
        press = float(jax.device_get(computes.pressure(
            t, self._last_virial, vol, dof, u.boltz, u.nktv2p,
            self.dimension)))
        epair = e["evdwl"] + e["ecoul"] + e["elong"]
        emol = e["ebond"] + e["eangle"] + e["edihed"] + e["eimp"]
        pe = epair + emol
        norm = self.natoms if self.thermo_norm else 1
        vals = {
            "step": self.step,
            "temp": t,
            "epair": epair / norm,
            "emol": emol / norm,
            "pe": pe / norm,
            "ke": ke / norm,
            "etotal": (pe + ke) / norm,
            "press": press,
            "vol": vol,
        }
        self.last_thermo = vals
        return vals

    _THERMO_HEADERS = {
        "step": "Step", "temp": "Temp", "epair": "E_pair", "emol": "E_mol",
        "etotal": "TotEng", "press": "Press", "pe": "PotEng", "ke": "KinEng",
        "vol": "Volume",
    }

    def _thermo_header(self):
        line = " ".join(self._THERMO_HEADERS.get(k, k).ljust(12)
                        for k in self.thermo_style)
        self._log(line.rstrip())

    def _thermo_line(self):
        vals = self.thermo_values()
        parts = []
        for k in self.thermo_style:
            v = vals[k]
            if k == "step":
                parts.append(f"{v:8d}")
            else:
                parts.append(f"{v:12.8g}")
        self._log(" ".join(parts))

    verbose = True

    def _log(self, line: str):
        self.log_lines.append(line)
        if self.verbose:
            print(line, flush=True)

    # ------------------------------------------------------------------ perf
    def performance(self) -> dict:
        """Matom-step/s report (formula of src/finish.cpp:141-160)."""
        if self.loop_time == 0:
            return {}
        steps_per_s = self.loop_steps / self.loop_time
        return {
            "loop_time": self.loop_time,
            "timesteps_per_s": steps_per_s,
            "matom_steps_per_s": steps_per_s * self.natoms / 1e6,
        }
