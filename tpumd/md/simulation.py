"""Host-side simulation orchestrator.

Plays the role of the reference's LAMMPS composition root + Update + Run +
Thermo (src/lammps.cpp:811-851, src/run.cpp, src/thermo.cpp): owns the
styles, fixes and state, segments the run between thermo outputs, and runs
each segment as one compiled scan on device.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.core.state import MDState, wrap_pbc
from tpumd.md import computes
from tpumd.md.verlet import StepContext, eval_energies, run_segment
from tpumd.ops import cellgrid as cg
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
        self.neigh_exclude = ()        # group-pair exclusion gmask bits
        self.bin_style = "bin"
        # "matrix" = padded neighbor-index lists (exact reference list
        # semantics); "cellgrid" = gather-free rolled cell blocks (TPU fast
        # path); "auto" picks cellgrid on accelerators when eligible
        self.neighbor_mode = "auto"

        self.state: MDState | None = None
        self.mass = None               # (ntypes+1,) numpy
        self.ntypes = 0
        self.pair = None
        self.bonded: list = []
        self.topology: dict = {}       # kind -> (M, 1+arity) tuple arrays
        self.bonded_ntypes: dict = {}
        self.kspace = None
        self.fixes: list = []
        self.special_lj = None         # (4,) or None
        self.special_coul = None
        self.special_tags = None
        self.special_codes = None

        self.thermo_every = 0          # 0: only first/last
        self.dumps: list = []
        self.computes: dict = {}       # id -> Compute object
        self.molecules: dict = {}      # id -> MoleculeTemplate
        self.groups: dict = {"all": 1}  # name -> gmask bit
        self.thermo_style = ["step", "temp", "epair", "emol", "etotal", "press"]
        self.thermo_multi = False      # thermo_style multi format
        self.thermo_norm = units == "lj"
        self.lost_policy = "error"     # thermo_modify lost error/warn/ignore
        self.log_lines: list[str] = []
        self.thermo_rows: list[dict] = []   # structured thermo history
        self.dimension = 3
        # per-dim boundary tokens (p periodic / f fixed / s shrink / m min)
        self.boundary = ("p", "p", "p")
        self._shrink_small = None  # SMALL * initial box lengths (static)
        self.respa = None          # (loops, cats) from run_style respa

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
        if self.state is None:
            return 0
        if self._natoms is None:
            self._natoms = int(jax.device_get(self.state.nlocal))
        return self._natoms

    _natoms = None
    _consts = None
    script = None
    timer_full = False
    timer_sync = False          # timer sync: device_get per segment
    timer_timeout = None        # wall-clock limit in seconds
    timer_every = 10            # timeout check granularity (segments)

    def mass_per_atom_np(self):
        if self.state.rmass is not None:
            rm = np.asarray(jax.device_get(self.state.rmass), np.float64)
            return rm[np.asarray(jax.device_get(self.state.tag)) > 0]
        return self.mass[np.asarray(jax.device_get(self.state.type))]

    def dof(self) -> float:
        extra = self.dimension
        fix_dof = sum(fx.dof_removed for fx in self.fixes)
        return self.dimension * self.natoms - extra - fix_dof

    def max_cutoff(self) -> float:
        cut = self.pair.max_cutoff if self.pair is not None else 0.0
        return cut

    def _resolve_mode(self) -> str:
        if self.neighbor_mode != "auto":
            return self.neighbor_mode
        # styles with an in-kernel coul exclusion correction (pair_fn_ex)
        # need per-pair charges in the grid kernel
        special_ok = (getattr(self.pair, "pair_fn_ex", None) is None
                      or self.state.q is not None)
        widths_ok = bool(np.all(
            np.asarray(jax.device_get(self.state.box.lengths), np.float64)
            >= 2.0 * (self.max_cutoff() + self.skin)))
        # granular has a rolled-block kernel with dense candidate shear
        # history (ops/cellgrid_gran.py, parity-tested), but on current
        # XLA the many-consumer pair intermediates fail to fuse and the
        # sweep is HBM-bound ~10x slower than the matrix gather path at
        # chute geometry — keep matrix as the auto choice; force with
        # neighbor_mode="cellgrid" to use the grid path
        eligible = (
            self.pair is not None
            and getattr(self.pair, "supports_cellgrid", False)
            and special_ok
            # fixes whose host-side buffers are indexed by atom row (fix
            # external) need the matrix engine's stable row order
            and not any(getattr(fx, "forces_matrix_engine", False)
                        for fx in self.fixes)
            and all(self.state.box.periodic)
            and not self.state.box.istriclinic
            and widths_ok
        )
        if eligible and jax.default_backend() != "cpu":
            return "cellgrid"
        return "matrix"

    def _make_ctx(self) -> StepContext:
        cutneigh = self.max_cutoff() + self.skin
        mode = self._resolve_mode()
        # under a barostat, leave headroom so moderate box shrinkage keeps
        # cell edges >= cutneigh (revalidated per segment).  The margin
        # is adaptive: every mid-run reconfig costs a full recompile of
        # the run segment (~150-200 s for the pppm+shake+npt stack), so
        # _revalidate_geometry widens it 10% per violation — reconfigs
        # back off exponentially instead of tracking a steady shrink.
        if self._barostat_active():
            margin = getattr(self, "_baro_margin", 1.12)
            self._baro_margin = margin
        else:
            margin = 1.0
        # cell-size factor: cells of F*cutneigh (stencil stays +-1).
        # Short-cutoff dilute systems (chain: ~3 atoms/cell) pay ~4x
        # Poisson-tail cap padding and per-row overhead at F=1; fatter
        # cells trade a little extra pair math for full VPU lanes and
        # ~2.5x fewer padded rows.  Auto: grow F while the mean cell
        # occupancy is far below a lane-efficient cap.
        cell_factor = getattr(self, "cell_factor", None)
        if mode == "cellgrid" and cell_factor is None:
            ell = np.asarray(jax.device_get(self.state.box.lengths),
                             np.float64)
            cell_factor = 1.0
            while cell_factor < 4.0:
                ncell = np.prod(np.maximum(
                    1, np.floor(ell / (cutneigh * margin
                                       * (cell_factor * 2))).astype(int)))
                if ncell < 27 or self.natoms / ncell > 28.0:
                    break
                cell_factor *= 2
        if mode == "cellgrid":
            margin = margin * (cell_factor or 1.0)
            cfg = cg.choose_cellgrid_config(
                self.state.box, cutneigh, self.skin, self.natoms,
                every=self.neigh_every, delay=self.neigh_delay,
                check=self.neigh_check,
                cap=getattr(self, "_cap_override", None),
                box_margin=margin,
            )
            if self.neigh_exclude:
                import dataclasses as _dc
                cfg = _dc.replace(cfg,
                                  exclude_bits=tuple(self.neigh_exclude))
        else:
            cfg = nb.choose_config(
                self.state.box, cutneigh, self.skin, self.natoms,
                every=self.neigh_every, delay=self.neigh_delay,
                check=self.neigh_check,
                has_special=self.special_tags is not None,
                kmax=getattr(self, "_kmax_override", None),
                cell_cap=getattr(self, "_cellcap_override", None),
                box_margin=margin,
            )
            if self.neigh_exclude:
                import dataclasses as _dc
                cfg = _dc.replace(cfg, exclude_bits=tuple(self.neigh_exclude))
            if (getattr(self, "_cellcap_override", None) is None
                    and not cfg.image_shifts):
                # size the per-cell capacity from the ACTUAL occupancy:
                # the mean-density heuristic is ~2x oversized for
                # settled granular packs, and rebuild cost scales with
                # cap (27*cap candidates/atom).  A +2 margin absorbs
                # drift; overflow still self-heals via the setup retry
                # and mid-run regrow.
                cid, _ = nb._cell_index(self.state.x, self.state.box, cfg)
                occ = np.bincount(
                    np.asarray(jax.device_get(cid), np.int64).clip(
                        0, cfg.ncells - 1), minlength=cfg.ncells)
                # granular contacts bound occupancy physically (+2 is
                # plenty); point particles diffuse, so keep a 30%
                # fluctuation margin to avoid mid-run regrow recompiles
                if getattr(self.pair, "is_granular", False):
                    tight = int(np.ceil((int(occ.max()) + 2) / 2) * 2)
                else:
                    tight = int(np.ceil((occ.max() * 1.3 + 2) / 2) * 2)
                if tight < cfg.cell_cap:
                    import dataclasses as _dc
                    cfg = _dc.replace(cfg, cell_cap=tight)
            if cfg.image_shifts and self.pair is not None and not getattr(
                    self.pair, "supports_image_ext", False):
                raise ValueError(
                    f"pair style {self.pair.name}: box smaller than "
                    f"2*cutneigh needs the multi-image candidate mode, "
                    f"which this style does not support yet")
        self._neigh_cfg = cfg
        mass_np = np.asarray(self.mass, dtype=np.float64).copy()
        mass_np[0] = 1.0  # padded slots: finite mass, zero force
        mass_table = jnp.asarray(mass_np, dtype=self.dtype)
        # special_bonds default is 0 0 0 (Force::Force, src/force.cpp:61)
        # — bonded neighbors are EXCLUDED from pair interactions unless
        # the script overrides the weights
        slj = self.special_lj
        scl = self.special_coul
        if self.special_tags is not None:
            if slj is None:
                slj = np.array([1.0, 0.0, 0.0, 0.0])
            if scl is None:
                scl = np.array([1.0, 0.0, 0.0, 0.0])
        sl = None if slj is None else jnp.asarray(slj, dtype=self.dtype)
        sc = None if scl is None else jnp.asarray(scl, dtype=self.dtype)
        # hostbuild (run_segment_hostbuild): the in-scan rebuild branch
        # faults the TPU worker on molecular/charged cell-grid decks
        # (observed: 32k CHARMM peptide, 9x4x4 grid, S=18 special
        # tables) — segment on the host around rebuilds there.  CPU and
        # the simple decks keep the on-device rebuild (faster and
        # bitwise-covered by the golden suite).  Override with
        # TPUMD_HOSTBUILD=0/1.
        hb_env = os.environ.get("TPUMD_HOSTBUILD")
        if hb_env is not None:
            hostbuild = hb_env == "1"
        else:
            hostbuild = (jax.default_backend() != "cpu"
                         and mode == "cellgrid"
                         and self.pair is not None
                         and getattr(self.pair, "pair_fn_ex", None)
                         is not None
                         and self.state.q is not None)
        return StepContext(
            hostbuild=hostbuild,
            units=self.units, dt=self.dt, neigh_cfg=cfg,
            pair=self.pair,
            bonded=tuple(b for b in self.bonded
                         if b is not self._kernel_bond),
            kspace=self.kspace,
            fixes=tuple(self.fixes), mass_table=mass_table,
            special_lj=sl, special_coul=sc,
            natoms=self.natoms, tdof=self.dof(),
            shrink=self._shrink_spec(),
            respa=self.respa,
            kernel_bond=self._kernel_bond,
            kernel_bond_excl=self._kernel_bond_excl,
            bonded_grid=self._bonded_grid_on,
        )

    _kernel_bond = None
    _kernel_bond_excl = False
    # opt-in gather-free bonded path for sharded molecular runs
    # (ops/cellgrid_tuples.py); default off — the row2slot gather view is
    # faster single-chip
    bonded_grid = os.environ.get("TPUMD_BONDED_GRID", "") == "1"
    _bonded_grid_on = False

    def _setup_grid_tuples(self, mode, shake_excl):
        """Install per-atom member-tag tables for the tag-matched bonded
        path (state.extras '_bt_*'; they permute with the atoms)."""
        self._bonded_grid_on = False
        stale = {k: v for k, v in self.state.extras.items()
                 if not k.startswith("_bt_")}
        if len(stale) != len(self.state.extras):
            self.state = self.state.replace(extras=stale)
        if (mode != "cellgrid" or not self.bonded_grid
                or not self.topology):
            return
        from tpumd.ops import cellgrid_tuples as ct
        styles = [b for b in self.bonded if b is not self._kernel_bond]
        arities = {}
        for b in styles:
            if b.kind in arities:
                raise ValueError("bonded_grid supports one style per "
                                 "tuple kind (no hybrid)")
            arities[b.kind] = b.arity
        topo = {k: v for k, v in self.topology.items() if k in arities}
        if not topo:
            return
        excl = {k: set(v) for k, v in (shake_excl or {}).items()}
        x_now = np.asarray(jax.device_get(self.state.x), np.float64)
        tags = np.asarray(jax.device_get(self.state.tag))
        x_tag = np.zeros_like(x_now)
        x_tag[tags - 1] = x_now
        # the stencil reaches one cell edge and cells are at least
        # cutneigh across (auto cell-size factor >= 1), so a span under
        # cutneigh is always matchable
        reach = self.max_cutoff() + self.skin
        ct.validate_tuple_span(x_tag, topo, arities, self.state.box,
                               reach, excl)
        tables = ct.build_tuple_tables(self.natoms, topo, arities, excl)
        row_tables = {k: jnp.asarray(v[tags - 1])
                      for k, v in tables.items()}
        self.state = self.state.replace(
            extras={**self.state.extras, **row_tables})
        self._bonded_grid_on = True

    def _setup_kernel_bond(self, mode, shake_excl):
        """Route an eligible 2-body bond style into the grid kernel:
        build per-atom (N, B) partner-tag/bond-type tables that ride the
        state (so they permute with the atoms) and let the pair sweep
        match them like special lists — zero per-step gathers for bonds.
        Eligibility: cellgrid mode, the style's max reach fits inside one
        cell (e.g. FENE's hard R0 limit <= cutneigh), and a pair style to
        ride on."""
        self._kernel_bond = None
        self._kernel_bond_excl = False
        if mode != "cellgrid" or self.pair is None or self.respa is not None:
            return
        cand = [b for b in self.bonded
                if b.kind == "bond" and hasattr(b, "kernel_bond_fn")]
        if len(cand) != 1 or "bond" not in self.topology:
            return
        b = cand[0]
        cutneigh = self.max_cutoff() + self.skin
        if b.kernel_reach > cutneigh or b.kernel_reach <= 0:
            return
        tuples = self.topology["bond"]
        if shake_excl.get("bond"):
            keep = [i for i in range(len(tuples))
                    if i not in shake_excl["bond"]]
            tuples = tuples[keep]
        if len(tuples) == 0:
            return
        n = self.natoms
        tags = np.asarray(jax.device_get(self.state.tag))
        row_of_tag = np.zeros(n + 1, dtype=np.int64)
        row_of_tag[tags] = np.arange(n)
        bt = np.asarray(tuples)
        # per-row partner/bond-type lists (both directions of each bond)
        counts = np.zeros(n, np.int64)
        for t1, t2 in ((1, 2), (2, 1)):
            np.add.at(counts, row_of_tag[bt[:, t1]], 1)
        B = int(counts.max())
        btags = np.zeros((n, B), np.int32)
        btyps = np.zeros((n, B), np.int32)
        fill = np.zeros(n, np.int64)
        for t1, t2 in ((1, 2), (2, 1)):
            for k in range(len(bt)):
                r = row_of_tag[bt[k, t1]]
                btags[r, fill[r]] = bt[k, t2]
                btyps[r, fill[r]] = bt[k, 0]
                fill[r] += 1
        self.state = self.state.replace(
            bond_tags=jnp.asarray(btags), bond_btypes=jnp.asarray(btyps))
        self._kernel_bond = b
        # can the special pass collapse into the bond hit?  Only when the
        # kept special entries are exactly the (unconstrained) 1-2 pairs
        # with both weights 0 and no in-kernel coul correction needs them
        if (self.special_tags is not None and self.special_lj is not None
                and float(np.asarray(self.special_lj)[1]) == 0.0
                and not shake_excl.get("bond")
                and self.state.q is None
                and getattr(self.pair, "pair_fn_ex", None) is None):
            sc = np.asarray(jax.device_get(self.state.special_codes))
            st = np.asarray(jax.device_get(self.state.special_tags))
            if ((sc[st > 0] == 1).all()):
                self._kernel_bond_excl = True

    def _shrink_spec(self) -> tuple:
        """Static shrink-wrap spec ((dim, lo, hi, small), ...) for
        Domain::reset_box; `small` = 1e-4 x the INITIAL box length."""
        spec = []
        for d, tok in enumerate(self.boundary):
            clo = tok[0]
            chi = tok[1] if len(tok) > 1 else tok[0]
            slo = clo in ("s", "m")
            shi = chi in ("s", "m")
            if slo or shi:
                spec.append((d, slo, shi, float(self._shrink_small[d])))
        return tuple(spec)

    # spatial sort at setup (Atom::sort, src/atom.cpp:2246): affects only
    # the atom *order*, but sequential host RNG streams (langevin) draw in
    # that order, so parity with the reference requires replicating it
    atom_sort = True

    def _sort_atoms_host(self):
        cutneigh = self.max_cutoff() + self.skin
        if cutneigh <= 0:
            return
        binsize = 0.5 * cutneigh
        s = self.state
        x = np.asarray(jax.device_get(s.x), dtype=np.float64)
        lo = np.asarray(jax.device_get(s.box.lo), dtype=np.float64)
        hi = np.asarray(jax.device_get(s.box.hi), dtype=np.float64)
        ell = hi - lo
        nbin = np.maximum((ell / binsize).astype(int), 1)
        bininv = nbin / ell
        c = np.clip(((x - lo) * bininv).astype(int), 0, nbin - 1)
        ibin = (c[:, 2] * nbin[1] + c[:, 1]) * nbin[0] + c[:, 0]
        perm = np.argsort(ibin, kind="stable")
        if np.array_equal(perm, np.arange(len(perm))):
            return
        pj = jnp.asarray(perm)
        from tpumd.core.state import map_per_atom
        self.state = map_per_atom(s, lambda a: a[pj])
        if self.special_tags is not None:
            self.special_tags = self.special_tags[perm]
            self.special_codes = self.special_codes[perm]

    def setup(self):
        """Initial neighbor build + force evaluation (Verlet::setup)."""
        self._mass_sum = None   # atom count/masses may have changed
        if self._shrink_small is None:
            ell0 = np.asarray(jax.device_get(self.state.box.lengths),
                              dtype=np.float64)
            self._shrink_small = 1.0e-4 * ell0  # SMALL, src/domain.cpp:46
        self._reset_box_host()
        if self.pair is not None:
            self.pair.init()
            if getattr(self.pair, "tail_flag", False):
                typ = np.asarray(jax.device_get(self.state.type))
                counts = np.bincount(typ, minlength=self.ntypes + 1)
                self.pair.compute_tails(counts.astype(np.float64))
            # granular effective-mass rule needs the frozen group's bit
            # (PairGranHookeHistory::init_style finds fix freeze)
            if getattr(self.pair, "is_granular", False):
                for fx in self.fixes:
                    if getattr(fx, "name", "") == "freeze":
                        self.pair.freeze_group_bit = fx.groupbit
                rad = np.asarray(jax.device_get(self.state.radius))
                self.pair.set_max_radius(float(rad.max()))
        if self.atom_sort:
            self._sort_atoms_host()
        # group-restricted thermostats: group temperature dof
        # (ComputeTemp::dof_compute over the fix group)
        for fx in self.fixes:
            if getattr(fx, "name", "") == "nh" and fx.groupbit != 1:
                gm = np.asarray(jax.device_get(self.state.gmask))
                ngroup = int(((gm & fx.groupbit) > 0).sum())
                fx.group_tdof = float(self.dimension * ngroup
                                      - self.dimension)
        mode = self._resolve_mode()
        # reference row order (post-sort, pre-grid-permutation): host RNG
        # streams draw in this order and are re-indexed by tag
        self._ref_order_tags = np.asarray(jax.device_get(self.state.tag))
        if self.special_tags is not None:
            # per-atom special lists ride the state (traced, not baked)
            st_np = np.asarray(self.special_tags, np.int32)
            sc_np = np.asarray(self.special_codes, np.int32)
            if mode == "cellgrid" and self.special_lj is not None:
                # grid kernel pays per entry per candidate: drop entries
                # whose weight is exactly 1 (no-op pairs); styles with an
                # in-kernel coul correction need coul-weighted entries too
                w = np.asarray(self.special_lj)[sc_np]
                keep = (st_np > 0) & (w != 1.0)
                if (self.special_coul is not None
                        and getattr(self.pair, "pair_fn_ex", None)
                        is not None):
                    wc = np.asarray(self.special_coul)[sc_np]
                    keep = (st_np > 0) & ((w != 1.0) | (wc != 1.0))
                smax = max(int(keep.sum(1).max()), 1)
                order = np.argsort(~keep, axis=1, kind="stable")[:, :smax]
                kept = np.take_along_axis(keep, order, 1)
                st_np = np.take_along_axis(st_np, order, 1) * kept
                sc_np = np.take_along_axis(sc_np, order, 1) * kept
            self.state = self.state.replace(
                special_tags=jnp.asarray(st_np, jnp.int32),
                special_codes=jnp.asarray(sc_np, jnp.int32))
        row_of_tag = None
        if self.topology and mode != "cellgrid":
            # matrix mode: incidence in (static) row space.  cellgrid mode
            # keeps incidence in TAG space and maps tags->slots per step.
            tags = np.asarray(jax.device_get(self.state.tag))
            row_of_tag = np.zeros(self.natoms + 1, dtype=np.int64)
            row_of_tag[tags] = np.arange(self.natoms)
        # shake clusters first: constrained bonds/angles are excluded from
        # the bonded force evaluation (reference: find_clusters negates
        # their types so topology lists skip them)
        excl = {"bond": set(), "angle": set()}
        for fx in self.fixes:
            if getattr(fx, "name", "") in ("shake", "rattle"):
                # (re)build with the post-sort atom ordering
                fx.build_clusters(self, row_of_tag)
                excl["bond"].update(fx.excl_bond_rows)
                excl["angle"].update(fx.excl_angle_rows)
        for b in self.bonded:
            if b.kind in self.topology:
                tuples = self.topology[b.kind]
                if excl.get(b.kind):
                    keep = [i for i in range(len(tuples))
                            if i not in excl[b.kind]]
                    tuples = tuples[keep]
                # (re)build incidence with the current (post-sort) ordering
                b.set_topology(self.natoms, tuples, row_of_tag)
            b.units = self.units
            b.init()
        for b in self.bonded:
            # breakable bonds (bond_style quartic): the per-incidence
            # alive mask is carried STATE (broken stays broken), seeded
            # once and preserved across re-setups; a built-in fix zeroes
            # it pre-force, matching the reference's in-loop
            # bondlist[n][2]=0 timing (bond_quartic.cpp:85-95)
            key = getattr(b, "dynamic_mask_key", None)
            if key and b._incidence is not None:
                if mode == "cellgrid":
                    raise ValueError(
                        "breakable bond styles (quartic) require the "
                        "matrix neighbor engine")
                if key not in self.state.extras:
                    mask0 = np.asarray(b._incidence[3], np.float64)
                    ex = dict(self.state.extras)
                    ex[key] = jnp.asarray(mask0, self.state.x.dtype)
                    self.state = self.state.replace(extras=ex)
                from tpumd.md.fixes import FixBondBreakMask
                if not any(getattr(fx, "name", "") == "bond_break_mask"
                           for fx in self.fixes):
                    self.fixes.append(FixBondBreakMask())
        for fx in self.fixes:
            # fix bond/create: padded created-bond slots + special
            # headroom, seeded once (created bonds persist)
            if not getattr(fx, "needs_new_bond_slots", False):
                continue
            if mode == "cellgrid":
                raise ValueError(
                    "fix bond/create requires the matrix neighbor engine")
            if self.special_lj is None:
                raise ValueError(
                    "fix bond/create requires special_bonds to be set")
            E = fx.nslots
            if "mc_new_pidx" not in self.state.extras:
                n = self.natoms
                dt_ = self.state.x.dtype
                ex = dict(self.state.extras)
                ex["mc_new_pidx"] = jnp.tile(
                    jnp.arange(n, dtype=dt_)[:, None], (1, E))
                ex["mc_new_typ"] = jnp.zeros((n, E), dt_)
                ex["mc_new_live"] = jnp.zeros((n, E), dt_)
                ex["mc_rebuild"] = jnp.zeros((n,), dt_)
                self.state = self.state.replace(extras=ex)
                # pad the special lists with headroom for insertions
                if self.special_tags is None:
                    self.special_tags = np.zeros((n, E), np.int32)
                    self.special_codes = np.zeros((n, E), np.int32)
                else:
                    self.special_tags = np.pad(
                        np.asarray(self.special_tags, np.int32),
                        ((0, 0), (0, E)))
                    self.special_codes = np.pad(
                        np.asarray(self.special_codes, np.int32),
                        ((0, 0), (0, E)))
                # the state picked up the unpadded lists earlier in
                # setup — swap in the padded ones
                self.state = self.state.replace(
                    special_tags=jnp.asarray(self.special_tags,
                                             jnp.int32),
                    special_codes=jnp.asarray(self.special_codes,
                                              jnp.int32))
        if any(getattr(fx, "needs_bond_alive", False) for fx in self.fixes):
            # fix bond/break: carried per-incidence alive mask, seeded
            # once (broken stays broken across re-setups)
            if mode == "cellgrid":
                raise ValueError(
                    "fix bond/break requires the matrix neighbor engine")
            bstyle = next((b for b in self.bonded if b.kind == "bond"),
                          None)
            if bstyle is not None and bstyle._incidence is not None \
                    and "mc_bond_alive" not in self.state.extras:
                mask0 = np.asarray(bstyle._incidence[3], np.float64)
                ex = dict(self.state.extras)
                ex["mc_bond_alive"] = jnp.asarray(mask0, self.state.x.dtype)
                ex["mc_rebuild"] = jnp.zeros(
                    (self.natoms,), self.state.x.dtype)
                self.state = self.state.replace(extras=ex)
        if getattr(self.pair, "is_tip4p", False):
            # resolve alpha + per-O hydrogen rows from the topology
            tip_rows = row_of_tag
            if tip_rows is None:
                tags = np.asarray(jax.device_get(self.state.tag))
                tip_rows = np.zeros(self.natoms + 1, dtype=np.int64)
                tip_rows[tags] = np.arange(self.natoms)
            self.pair.setup_tip4p(self, tip_rows)
        self._setup_kernel_bond(mode, excl)
        self._setup_grid_tuples(mode, excl)
        self._consts = (tuple(b.device_incidence()
                              for b in self.bonded
                              if b is not self._kernel_bond)
                        or None)
        if self.kspace is not None:
            self.kspace.init(self)
        for attempt in range(6):
            self._ctx = self._make_ctx()
            ctx = self._ctx

            s = wrap_pbc(self.state)
            if ctx.is_cellgrid:
                cfg = ctx.neigh_cfg
                s = cg.pad_state(s, cfg.capacity)
                valid0 = jnp.arange(s.x.shape[0]) < self.natoms
                perm, valid, max_count, over = cg.bin_permutation(
                    s.x, valid0, s.box, cfg)
                s = cg.apply_permutation(s, perm, valid)
                stags_d = shear_d = None
                if getattr(self.pair, "is_granular", False):
                    from tpumd.ops.cellgrid_gran import KH
                    stags_d = jnp.zeros((cfg.capacity, KH), jnp.int32)
                    shear_d = jnp.zeros((cfg.capacity, KH, 3), s.x.dtype)
                neigh = cg.CellGridState(
                    valid=valid, xhold=s.x,
                    ago=jnp.zeros((), jnp.int32),
                    nbuilds=jnp.ones((), jnp.int32),
                    overflow=over, max_count=max_count,
                    row2slot=cg.row2slot_from_tags(s.tag, self.natoms),
                    shear_tags=stags_d, shear=shear_d)
            else:
                idx, sbits, max_count, over = nb.build_neighbors(
                    s.x, s.box, ctx.neigh_cfg,
                    special_tags=s.special_tags,
                    special_codes=s.special_codes, tag=s.tag,
                    gmask=s.gmask)
                shear = None
                if getattr(self.pair, "is_granular", False):
                    shear = jnp.zeros(
                        idx.shape + (self.pair.size_history,), s.x.dtype)
                    stash = getattr(self, "_shear_stash", None)
                    if stash is not None and self.pair.size_history:
                        # carry contact history across a host re-setup
                        # that GREW the atom array (fix pour): rows are
                        # appended at the end, so pad + tag-remap
                        oidx, osh = stash
                        n_new, k_new = idx.shape
                        n_old, k_old = oidx.shape
                        if n_new >= n_old and osh is not None:
                            selfpad = jnp.arange(
                                n_old, n_new, dtype=oidx.dtype)[:, None]
                            oidx = jnp.concatenate([
                                oidx, jnp.broadcast_to(
                                    selfpad, (n_new - n_old, k_old))])
                            osh = jnp.concatenate([
                                osh, jnp.zeros((n_new - n_old, k_old,
                                                osh.shape[-1]),
                                               osh.dtype)])
                            from tpumd.md.verlet import _remap_shear
                            shear = _remap_shear(oidx, idx,
                                                 osh.astype(s.x.dtype))
                    self._shear_stash = None
                neigh = nb.NeighborState(
                    idx=idx, sbits=sbits, xhold=s.x,
                    ago=jnp.zeros((), jnp.int32),
                    nbuilds=jnp.ones((), jnp.int32),
                    overflow=over, max_count=max_count, shear=shear)
            if not bool(jax.device_get(neigh.overflow)):
                if (not ctx.is_cellgrid
                        and getattr(self, "_kmax_override", None) is None):
                    # shrink once from the OBSERVED max count: pair-sweep
                    # gather cost is per neighbor row, so an oversized
                    # kmax taxes every step (the density heuristic gives
                    # 16 where chute's true max is 11); +3 margin, and
                    # mid-run regrow still covers drift past it
                    # multiples of 8 only: K=14 measured SLOWER than 16
                    # on TPU (76 s compile + 30% slower steps — XLA's
                    # gather/tiling wants power-of-two-ish row widths)
                    mc = int(jax.device_get(neigh.max_count))
                    tight = int(np.ceil((mc + 3) / 8) * 8)
                    if tight + 4 <= ctx.neigh_cfg.kmax:
                        self._kmax_override = tight
                        continue
                break
            # grow capacities from the observed maximum and retry
            mc = int(jax.device_get(neigh.max_count))
            if ctx.is_cellgrid:
                self._cap_override = int(
                    np.ceil(max(ctx.neigh_cfg.cap * 1.5, mc * 1.3) / 8) * 8)
            else:
                self._kmax_override = int(
                    max(ctx.neigh_cfg.kmax * 1.5, mc * 1.3) + 8)
                self._cellcap_override = int(
                    np.ceil(ctx.neigh_cfg.cell_cap * 1.5 / 8) * 8)
        self._check_overflow(neigh)

        f, energies, virial, torque = eval_energies(
            s, neigh, ctx, consts=self._consts)
        s = s.replace(f=f)
        if torque is not None:
            s = s.replace(torque=torque)
        fstates = [self._init_fix_state(fx, s, ctx) for fx in self.fixes]
        # the reference applies post_force fixes once during setup
        # (Verlet::setup -> modify->setup -> FixLangevin::post_force), which
        # both kicks the step-0 forces and consumes RNG draws
        for i, fx in enumerate(self.fixes):
            xin = fx.segment_inputs(1, ctx, s)
            hook = getattr(fx, "setup_post_force", fx.post_force)
            s, fstates[i] = hook(
                s, fstates[i], ctx, None if xin is None else xin[0])
            if getattr(fx, "contributes_virial", False):
                virial = virial + fx.virial_contrib(fstates[i])
        for i, fx in enumerate(self.fixes):
            if getattr(fx, "needs_virial", False):
                fstates[i] = fx.save_virial(
                    fstates[i], virial.astype(s.x.dtype))
        # barostat setup priming (FixRigidNH::setup tail needs the
        # setup-time pressure, i.e. state + saved virial together)
        for i, fx in enumerate(self.fixes):
            if hasattr(fx, "setup_with_state_virial"):
                fstates[i] = fx.setup_with_state_virial(s, fstates[i], ctx)
        self._carry = (s, neigh, tuple(fstates),
                       jnp.asarray(self.step, jnp.int32))
        if self.respa is not None:
            from tpumd.md.verlet import respa_hook_fixes
            respa_hook_fixes(ctx)   # validates the fix set for respa
            from tpumd.md.verlet import (compute_forces_cats,
                                         respa_setup_hooks)
            flev = tuple(compute_forces_cats(s, neigh, ctx, c, self._consts)
                         for c in self.respa[1])
            flev, fstates = respa_setup_hooks(s, flev, tuple(fstates), ctx)
            s = s.replace(f=sum(flev))
            self._carry = self._carry[:1] + (neigh, tuple(fstates),
                                             self._carry[3], flev)
            self._carry = (s,) + self._carry[1:]
        self.state = s
        self._last_energies = energies
        self._last_virial = virial
        for c in self.computes.values():
            if c._ref is None:
                c.prepare(self)

    def _reset_box_host(self):
        """Host-side Domain::reset_box at setup for shrink-wrapped dims."""
        spec = self._shrink_spec()
        if not spec:
            return
        s = self.state
        x = np.asarray(jax.device_get(s.x), dtype=np.float64)
        lo = np.array(jax.device_get(s.box.lo), dtype=np.float64)
        hi = np.array(jax.device_get(s.box.hi), dtype=np.float64)
        tag = np.asarray(jax.device_get(s.tag))
        xv = x[tag > 0]
        for d, slo, shi, small in spec:
            if shi:
                hi[d] = xv[:, d].max() + small
            if slo:
                lo[d] = xv[:, d].min() - small
        self.state = s.replace(box=s.box.replace(
            lo=jnp.asarray(lo, self.dtype), hi=jnp.asarray(hi, self.dtype)))

    def invalidate_ctx(self):
        """Force a re-setup before the next run (fix set / styles changed).

        The reference rebuilds Modify's per-phase fix lists in lmp->init()
        at every run command; our compiled StepContext is the analog and
        must be discarded when the fix list changes.  Fix states of fixes
        that survive the change are stashed and restored at the next setup
        (LAMMPS fixes keep internal state, e.g. NH chain positions, across
        run commands)."""
        if self._ctx is None:
            return
        if self._carry is not None:
            self._fstate_stash = {
                id(fx): st for fx, st in zip(self._ctx.fixes, self._carry[2])}
            # compact padded grid-ordered state back to natoms rows
            if self._ctx.is_cellgrid:
                self.state = cg.compact_state(
                    self._carry[0], self._carry[1].valid, self.natoms)
            else:
                self.state = self._carry[0]
                neigh = self._carry[1]
                if getattr(neigh, "shear", None) is not None:
                    # granular contact history survives atom-count
                    # growth (fix pour) via tag remap at the next setup
                    self._shear_stash = (neigh.idx, neigh.shear)
        self._ctx = None
        self._carry = None

    _fstate_stash: dict = {}

    def _init_fix_state(self, fx, s, ctx):
        fx._sim = self          # host-side back-ref (setup-time only)
        fresh = fx.init_state(s, ctx)
        stashed = self._fstate_stash.get(id(fx))
        if stashed is not None:
            try:
                if jax.tree.structure(stashed) != jax.tree.structure(fresh):
                    return fresh
                sl, fl = jax.tree.leaves(stashed), jax.tree.leaves(fresh)
                if all(a.shape == b.shape for a, b in zip(sl, fl)):
                    return stashed
                if getattr(fx, "peratom_state", False) and all(
                        a.shape == b.shape
                        or (a.ndim == b.ndim and a.ndim >= 1
                            and a.shape[1:] == b.shape[1:]
                            and a.shape[0] < b.shape[0])
                        for a, b in zip(sl, fl)):
                    # atom array grew (fix pour appends rows at the end):
                    # keep the stashed per-atom state, fresh-init new rows
                    merged = [a if a.shape == b.shape
                              else jnp.concatenate([a, b[a.shape[0]:]])
                              for a, b in zip(sl, fl)]
                    return jax.tree.unflatten(
                        jax.tree.structure(fresh), merged)
            except Exception:
                pass
        return fresh

    def _check_overflow(self, neigh):
        if bool(jax.device_get(neigh.overflow)):
            raise RuntimeError(
                "neighbor overflow: "
                f"max_count={int(jax.device_get(neigh.max_count))} "
                f"cfg={self._neigh_cfg}")

    # ------------------------------------------------------------------ run
    def run(self, nsteps: int):
        # host fixes that act at the start of a run (fix pour's first
        # insertion batch, reference pre_exchange at ntimestep+1)
        for fx in self.fixes:
            if hasattr(fx, "host_run_begin"):
                fx.host_run_begin(self)
        if self._ctx is None:
            self.setup()
        ctx = self._ctx
        self._thermo_header()
        self._thermo_line()  # setup thermo at current step

        for d in self.dumps:
            d.write(self)
        # ave-family fixes sample/emit at setup when the run starts on
        # one of their output steps (FixAveTime::setup -> end_of_step)
        for fx in self.fixes:
            if getattr(fx, "invoke_at_setup", False) \
                    and getattr(fx, "nfreq", 0) \
                    and getattr(fx, "nrepeat", 0) == 1 \
                    and self.step % fx.nfreq == 0 \
                    and not getattr(fx, "_setup_invoked", False):
                fx.host_end_of_step(self)
                fx._setup_invoked = True
        # setup-time sampling hooks (FixAveCorrelate: the reference's
        # setup() takes the step-0 sample and emits a first block)
        for fx in self.fixes:
            if hasattr(fx, "host_setup_sample") \
                    and not getattr(fx, "_setup_sampled", False):
                fx.host_setup_sample(self)
                fx._setup_sampled = True
        target = self.step + nsteps
        # run begin/end steps for fixes with start->stop target ramps
        # (Update::beginstep/endstep, used by FixNH::compute_temp_target)
        s0, neigh0, fstates0, istep0 = self._carry[:4]
        fstates0 = list(fstates0)
        for i, fx in enumerate(self.fixes):
            if hasattr(fx, "pre_run"):
                fstates0[i] = fx.pre_run(fstates0[i], self.step, target)
        self._carry = (s0, neigh0, tuple(fstates0), istep0) \
            + tuple(self._carry[4:])
        for fx in self.fixes:
            if hasattr(fx, "sync_array"):
                fx.sync_array(self)   # fix external pf/array force push
        t0 = time.perf_counter()
        if not hasattr(self, "_cpu_start"):
            self._cpu_start = t0
        self._halt = None
        if self._stream_ok(nsteps, ctx):
            self._run_streamed(nsteps, ctx, t0)
            return
        while self.step < target:
            nxt = target
            everies = ([self.thermo_every] + [d.every for d in self.dumps]
                       + [getattr(fx, "host_every", 0) for fx in self.fixes])
            for every in everies:
                if every and every > 0:
                    nxt = min(nxt, (self.step // every + 1) * every)
            seg = nxt - self.step
            xs = self._segment_inputs(seg, ctx)
            cb_fixes = [fx for fx in self.fixes
                        if getattr(fx, "mode", "") == "pf/callback"
                        and fx.callback is not None]
            if cb_fixes and xs is not None:
                raise RuntimeError(
                    "fix external pf/callback cannot combine with fixes "
                    "that feed per-step host streams")
            # end_of_step box-changing fixes (press/berendsen, deform)
            # dilate AFTER the force evaluation whose energies thermo
            # must report (Thermo reads the force-eval-time pe/virial,
            # src/thermo.cpp) — split the segment's last step in half and
            # evaluate energies at the mid state
            split_last = (ctx.respa is None and not cb_fixes
                          and any(getattr(fx, "eos_box_change", False)
                                  for fx in self.fixes))
            mid_energies = None
            while True:
                snapshot = self._carry
                mid_energies = None
                nmain = seg - 1 if split_last else seg
                if cb_fixes:
                    carry = self._advance_with_callbacks(seg, ctx, cb_fixes)
                elif xs is None or nmain == 0:
                    carry = self._carry
                    if nmain > 0 and ctx.hostbuild:
                        carry = self._advance_hostbuild(carry, ctx, nmain)
                    elif nmain > 0:
                        from tpumd.md.verlet import run_segment_dyn
                        carry = run_segment_dyn(carry, ctx,
                                                jnp.int32(nmain),
                                                consts=self._consts)
                else:
                    xs_main = jax.tree_util.tree_map(
                        lambda a: a[:nmain], xs)
                    carry = run_segment(self._carry, ctx, nmain, xs_main,
                                        consts=self._consts)
                if split_last:
                    from tpumd.md.verlet import (step_pre_half,
                                                 step_post_half)
                    xs_last = None if xs is None else \
                        jax.tree_util.tree_map(lambda a: a[seg - 1], xs)
                    mid = step_pre_half(carry, ctx, consts=self._consts,
                                        xs=xs_last)
                    _, energies_m, virial_m, _ = eval_energies(
                        mid[0], mid[1], ctx, consts=self._consts)
                    mid_energies = (energies_m, virial_m)
                    carry = step_post_half(mid, ctx, consts=self._consts,
                                           xs=xs_last)
                if bool(jax.device_get(carry[1].overflow)):
                    # grow capacities, redo the segment from the snapshot
                    # (same xs: host RNG streams are not re-drawn)
                    ctx = self._regrow(snapshot)
                    continue
                break
            s, neigh, fstates, istep = carry[:4]
            self._carry = carry
            if self.timer_sync:
                # timer sync: block at every segment boundary so the
                # thermo-interval wall times are honest (Timer::_stamp
                # sync levels, src/timer.cpp:128-146)
                jax.device_get(carry[0].x[0])
            self.state = s
            self.step = nxt
            if self._barostat_active():
                self._revalidate_geometry()
                ctx = self._ctx
                s, neigh, fstates, istep = self._carry[:4]
                self.state = s
            # carry keeps the in-step f/torque; this eval only refreshes
            # energies and the virial for thermo
            if mid_energies is not None:
                energies, virial = mid_energies
            else:
                f, energies, virial, _ = eval_energies(
                    s, neigh, ctx, consts=self._consts)
            for i, fx in enumerate(self.fixes):
                if getattr(fx, "contributes_virial", False):
                    virial = virial + fx.virial_contrib(fstates[i])
            self._last_energies = energies
            self._last_virial = virial
            # end_of_step fixes run BEFORE output writes — including
            # thermo (Verlet::run: modify->end_of_step then
            # output->write); state-modifying host fixes (MP swaps,
            # fix heat) must be visible in the same step's thermo
            for fx in self.fixes:
                ev = getattr(fx, "host_every", 0)
                if ev and self.step % ev == 0:
                    fx.host_end_of_step(self)
            if self._ctx is None:
                # a host fix changed the atom count/styles: re-setup
                self.setup()
                ctx = self._ctx
            if self.step == target or (self.thermo_every > 0
                                       and self.step % self.thermo_every == 0):
                self._thermo_line()
            for d in self.dumps:
                if d.every and self.step % d.every == 0:
                    d.write(self)
            if self._ctx is None:
                # a host fix changed the atom count/styles: re-setup
                self.setup()
                ctx = self._ctx
            if getattr(self, "_halt", None):
                self._log(self._halt)
                break
            # timer timeout: stop cleanly at a segment boundary
            # (Timer::check_timeout, src/timer.cpp:190-214)
            if self.timer_timeout is not None and \
                    time.perf_counter() - self._cpu_start \
                    > self.timer_timeout:
                self._log("Wall time limit reached")
                break
        # device_get forces completion (block_until_ready is unreliable on
        # the remote-tunnel TPU backend)
        jax.device_get(self._carry[0].x[0])
        elapsed = time.perf_counter() - t0
        self.loop_time += elapsed
        self.loop_steps += nsteps
        self._finish_report(elapsed, nsteps)

    _STREAM_KEYS = frozenset((
        "step", "temp", "epair", "emol", "pe", "ke", "etotal", "press",
        "vol", "lx", "ly", "lz", "xy", "xz", "yz", "evdwl", "ecoul",
        "elong", "ebond", "eangle", "edihed", "eimp", "atoms", "density"))

    def _stream_ok(self, nsteps: int, ctx) -> bool:
        """Eligibility for the single-dispatch streamed run: uniform
        thermo-only output stops with no per-stop host work.  Everything
        else uses the segmented loop."""
        L = self.thermo_every
        if not (L and L > 0 and self.step % L == 0 and nsteps % L == 0
                and nsteps >= 2 * L):
            return False
        if ctx.hostbuild:
            # hostbuild decks segment around rebuilds on the host; the
            # banked-stop stream has the faulting in-scan rebuild branch
            return False
        if any(d.every and d.every > 0 for d in self.dumps):
            return False
        for fx in self.fixes:
            if getattr(fx, "host_every", 0):
                return False
            if getattr(fx, "eos_box_change", False):
                return False
            if getattr(fx, "mode", "") == "pf/callback" \
                    and fx.callback is not None:
                return False
            # a zero-length probe detects host-stream fixes (bit-exact
            # RanMars langevin, variable-style fix move) without
            # consuming any RNG draws
            if fx.segment_inputs(0, ctx, self._carry[0]) is not None:
                return False
        if self._barostat_active():
            return False
        if self.timer_sync or self.timer_timeout is not None:
            return False
        if self.thermo_multi:
            return False
        if not all(k in self._STREAM_KEYS for k in self.thermo_style):
            return False
        return True

    def _run_streamed(self, nsteps: int, ctx, t0: float):
        """One-dispatch run: device loops over thermo intervals and banks
        packed thermo rows; the host syncs once per STREAM_MAX_STOPS
        intervals instead of once per thermo stop (each sync costs a
        ~20 ms tunnel round trip on remote TPU backends)."""
        from tpumd.md.verlet import (run_stream, STREAM_MAX_STOPS)
        L = self.thermo_every
        nstops_total = nsteps // L
        scal = self._thermo_scal()
        mass_arr = self._thermo_mass_arr()
        rows = []
        done = 0
        while done < nstops_total:
            nstops = min(nstops_total - done, STREAM_MAX_STOPS)
            while True:
                snapshot = self._carry
                carry, buf = run_stream(
                    snapshot, ctx, jnp.int32(nstops), jnp.int32(L),
                    scal, mass_arr, consts=self._consts)
                if bool(jax.device_get(carry[1].overflow)):
                    ctx = self._regrow(snapshot)
                    continue
                break
            rows.append(np.asarray(jax.device_get(buf), np.float64)[:nstops])
            self._carry = carry
            done += nstops
        s, neigh, fstates, istep = self._carry[:4]
        self.state = s
        # refresh energies/virial for post-run readers (run 0 reprints,
        # computes, restart headers) — async dispatch, no extra sync
        f, energies, virial, _ = eval_energies(s, neigh, ctx,
                                               consts=self._consts)
        for i, fx in enumerate(self.fixes):
            if getattr(fx, "contributes_virial", False):
                virial = virial + fx.virial_contrib(fstates[i])
        self._last_energies = energies
        self._last_virial = virial
        for block in rows:
            for row in block:
                self.step += L
                self._emit_vals(self._vals_from_packed(row))
        # per-stop checks that need big-array fetches run once per run
        # here (the segmented path runs them per stop)
        self._escape_checks(s)
        st = getattr(neigh, "shear_tags", None)
        if (st is not None and getattr(st, "ndim", 0) == 2
                and not self._hist_saturated_warned):
            if bool(jax.device_get(jnp.all(st != 0, axis=1).any())):
                self._hist_saturated_warned = True
                self._log("WARNING: granular contact-history slots "
                          "saturated for some atom — contacts beyond "
                          f"{st.shape[1]} per atom lose shear history")
        jax.device_get(self._carry[0].x[0])
        elapsed = time.perf_counter() - t0
        self.loop_time += elapsed
        self.loop_steps += nsteps
        self._finish_report(elapsed, nsteps)

    def _advance_hostbuild(self, carry, ctx, nsteps: int):
        """Advance nsteps with host-driven rebuild segmentation: the
        device loop exits before each rebuild (run_segment_hostbuild)
        and the re-bin runs as its own dispatch (rebuild_eager).  One
        host round trip per rebuild (~every `delay` steps) instead of
        an in-scan cond whose branch faults the TPU worker on the
        molecular deck shapes."""
        from tpumd.md.verlet import rebuild_eager, run_segment_hostbuild
        left = nsteps
        stall = 0
        while left > 0:
            carry, done = run_segment_hostbuild(
                carry, ctx, jnp.int32(left), consts=self._consts)
            done = int(jax.device_get(done))
            left -= done
            if left > 0:
                carry = rebuild_eager(carry, ctx)
                if bool(jax.device_get(carry[1].overflow)):
                    # caller's overflow check snapshots + regrows
                    return carry
                stall = stall + 1 if done == 0 else 0
                if stall > 2:
                    raise RuntimeError(
                        "hostbuild segmentation stalled: Neighbor::decide"
                        " fires every step (use every/delay > 1 or "
                        "TPUMD_HOSTBUILD=0)")
        return carry

    def _finish_report(self, elapsed: float, nsteps: int):
        """End-of-run report (Finish::end, src/finish.cpp:130-160)."""
        n = self.natoms
        ndev = 1
        self._log(f"Loop time of {elapsed:.6g} on {ndev} device "
                  f"for {nsteps} steps with {n} atoms")
        if elapsed > 0 and nsteps > 0:
            sps = nsteps / elapsed
            matom = sps * n / 1e6
            u = self.units
            if u.femtosecond > 0:
                perday = sps * self.dt * u.femtosecond * 1e-6 * 86400
                unit_day = f"{perday:.3f} ns/day"
            else:
                unit_day = f"{sps * self.dt * 86400:.3f} tau/day"
            self._log(f"Performance: {unit_day}, {sps:.3f} timesteps/s, "
                      f"{matom:.3f} Matom-step/s")
        nb = int(jax.device_get(self._carry[1].nbuilds))
        self._log(f"Neighbor list builds = {nb - 1}")
        if getattr(self, "timer_full", False):
            self._timer_breakdown(elapsed, nsteps)

    def _timer_breakdown(self, elapsed, nsteps):
        """Approximate per-category timing (Timer/Finish, src/timer.h:23-44):
        times the force and neighbor stages in isolation (cached compiles)
        and attributes the remainder to integrate/fix/other."""
        from tpumd.md.verlet import compute_forces
        s, neigh, fstates, _ = self._carry
        ctx = self._ctx

        def timeit(fn, reps=5):
            out = fn()
            jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
            return (time.perf_counter() - t0) / reps

        force_fn = jax.jit(lambda st, ne: compute_forces(
            st, ne, ctx, False, False, consts=self._consts)[0])
        t_force = timeit(lambda: force_fn(s, neigh))
        # sub-category re-timings (Bond/Kspace columns of the reference's
        # Timer::NORMAL breakdown, src/finish.cpp)
        t_bond = t_kspace = 0.0
        if ctx.bonded or ctx.kernel_bond is not None:
            from tpumd.md.verlet import compute_forces_cats
            bond_fn = jax.jit(lambda st, ne: compute_forces_cats(
                st, ne, ctx, ("bond", "angle", "dihedral", "improper"),
                self._consts))
            try:
                t_bond = timeit(lambda: bond_fn(s, neigh))
            except Exception:   # kernel-bond styles have no cats path
                t_bond = 0.0
        if ctx.kspace is not None:
            ks_fn = jax.jit(lambda st: ctx.kspace.compute(
                st, False, False)[0])
            t_kspace = timeit(lambda: ks_fn(s))
        if ctx.is_cellgrid:
            build_fn = jax.jit(lambda x, tg: cg.bin_compact(
                x, tg, ctx.natoms, s.box, ctx.neigh_cfg,
                row2slot=neigh.row2slot)[0])
            t_build = timeit(lambda: build_fn(s.x, s.tag))
        else:
            build_fn = jax.jit(lambda x: nb.build_neighbors(
                x, s.box, ctx.neigh_cfg, special_tags=s.special_tags,
                special_codes=s.special_codes, tag=s.tag,
                gmask=s.gmask)[0])
            t_build = timeit(lambda: build_fn(s.x))
        # the full compiled step (no-rebuild branch) measures the
        # Integrate/Fix share directly — categories then SUM to the
        # measured per-step time instead of leaving an unexplained gap
        from tpumd.md.verlet import make_step_fn
        step = make_step_fn(ctx, self._consts)
        carry0 = self._carry
        step_fn = jax.jit(lambda c: step(c, None)[0])
        t_step = timeit(lambda: step_fn(carry0))

        nbuilds = max(int(jax.device_get(neigh.nbuilds)) - 1, 0)
        per_step = elapsed / max(nsteps, 1)
        t_neigh = t_build * nbuilds / max(nsteps, 1)
        t_step = max(t_step, t_force)   # measurement noise guard
        t_intfix = t_step - t_force
        t_pair = max(t_force - t_bond - t_kspace, 0.0)
        t_other = max(per_step - t_step - t_neigh, 0.0)
        cats = [("Pair", t_pair), ("Bond", t_bond), ("Kspace", t_kspace),
                ("Neigh", t_neigh), ("Integrate/Fix", t_intfix),
                ("Output/Other", t_other)]
        # normalize so the table sums exactly to the loop per-step time
        tot = sum(t for _, t in cats) or 1.0
        cats = [(n, t * per_step / tot) for n, t in cats]
        cover = 100.0 * (t_step + t_neigh) / per_step
        self._log("Timing breakdown: " + " | ".join(
            f"{name} {100 * t / per_step:.1f}% ({t * 1e3:.3f} ms)"
            for name, t in cats)
            + f"  [measured step+neigh covers {cover:.1f}% of loop]")
        self.timer_table = {name: t for name, t in cats}
        self.timer_table["per_step"] = per_step
        self.timer_table["coverage"] = cover / 100.0

    def minimize(self, etol, ftol, maxiter, maxeval):
        if self._ctx is None:
            self.setup()
        style = getattr(self, "min_style", "fire")
        if style in ("cg", "sd"):
            from tpumd.md.minimize import minimize_cg
            run_min = lambda *a: minimize_cg(*a, style=style)  # noqa: E731
        elif style == "quickmin":
            from tpumd.md.minimize import minimize_quickmin as run_min
        elif style == "hftn":
            from tpumd.md.minimize import minimize_hftn as run_min
        else:
            from tpumd.md.minimize import minimize as run_min
        self._thermo_header()
        self._thermo_line()
        conv, niter, e0, e1 = run_min(self, etol, ftol, maxiter, maxeval)
        self._thermo_line()
        self._log(f"Minimization: {'converged' if conv else 'max iterations'}"
                  f" after {niter} iterations, E {e0:.10g} -> {e1:.10g}")
        return conv

    def _advance_with_callbacks(self, seg: int, ctx, cb_fixes):
        """Advance ``seg`` steps, splitting each step whose timestep is a
        multiple of a pf/callback fix's Ncall into a compiled pre-half
        (through force computation) + host callback + compiled post-half
        — the reference's mid-post_force callback timing
        (src/fix_external.cpp:141-176)."""
        from tpumd.md.verlet import (run_segment_dyn, step_post_half,
                                     step_pre_half)
        # setup-time callback: Fix::setup -> post_force at the run's start
        # step (src/fix_external.cpp:110-113); its fill persists in the
        # fix state and applies over steps start+1 .. next multiple.
        for fx in cb_fixes:
            if self.step % fx.ncall == 0:
                fx.invoke_callback(self, self.step, at_setup=True)
        done = 0
        while done < seg:
            t0 = self.step + done
            next_cb = min((t0 // fx.ncall + 1) * fx.ncall
                          for fx in cb_fixes)
            plain = min(seg - done, next_cb - t0 - 1)
            if plain > 0:
                self._carry = run_segment_dyn(
                    self._carry, ctx, jnp.int32(plain),
                    consts=self._consts)
                done += plain
                continue
            mid = step_pre_half(self._carry, ctx, consts=self._consts)
            self._carry = mid
            for fx in cb_fixes:
                if (t0 + 1) % fx.ncall == 0:
                    fx.invoke_callback(self, t0 + 1)
            self._carry = step_post_half(self._carry, ctx,
                                         consts=self._consts)
            done += 1
        return self._carry

    def _segment_inputs(self, seg: int, ctx):
        xs = tuple(fx.segment_inputs(seg, ctx, self._carry[0])
                   for fx in self.fixes)
        return None if all(x is None for x in xs) else xs

    def _rebuild_ctx(self, snapshot):
        """Re-derive the StepContext for the snapshot's current box and
        rebuild the neighbor structure in place (capacities/cell counts may
        have changed via overrides or box deformation)."""
        s0, neigh0, fstates, istep = snapshot[:4]
        if self._ctx.is_cellgrid:
            ctags_t = cshear_t = None
            if neigh0.shear is not None:
                # carry contact history across the re-grow through a
                # tag-indexed view (capacities/cells change)
                from tpumd.ops import cellgrid_gran as cgg
                tgt = jnp.where(s0.tag > 0, s0.tag - 1, self.natoms)
                ctags_t = jnp.zeros((self.natoms, cgg.KH), jnp.int32
                                    ).at[tgt].set(neigh0.shear_tags,
                                                  mode="drop")
                cshear_t = jnp.zeros((self.natoms, cgg.KH, 3),
                                     neigh0.shear.dtype
                                     ).at[tgt].set(neigh0.shear,
                                                   mode="drop")
            s0 = cg.compact_state(s0, neigh0.valid, self.natoms)
            self.state = s0
            self._ctx = ctx = self._make_ctx()
            cfg = ctx.neigh_cfg
            s0 = cg.pad_state(wrap_pbc(s0), cfg.capacity)
            valid0 = jnp.arange(s0.x.shape[0]) < self.natoms
            perm, valid, max_count, over = cg.bin_permutation(
                s0.x, valid0, s0.box, cfg)
            s0 = cg.apply_permutation(s0, perm, valid)
            shear_d = None
            stags_d = shear_d = None
            if ctags_t is not None:
                rows = jnp.clip(s0.tag - 1, 0)
                ok = (s0.tag > 0)
                stags_d = jnp.where(ok[:, None], ctags_t[rows], 0)
                shear_d = jnp.where(ok[:, None, None], cshear_t[rows], 0)
            elif getattr(self.pair, "is_granular", False):
                from tpumd.ops.cellgrid_gran import KH
                stags_d = jnp.zeros((cfg.capacity, KH), jnp.int32)
                shear_d = jnp.zeros((cfg.capacity, KH, 3), s0.x.dtype)
            neigh = cg.CellGridState(
                valid=valid, xhold=s0.x, ago=jnp.zeros((), jnp.int32),
                nbuilds=neigh0.nbuilds, overflow=over, max_count=max_count,
                row2slot=cg.row2slot_from_tags(s0.tag, self.natoms),
                shear_tags=stags_d, shear=shear_d)
        else:
            self.state = s0
            self._ctx = ctx = self._make_ctx()
            s0 = wrap_pbc(s0)
            idx, sbits, max_count, over = nb.build_neighbors(
                s0.x, s0.box, ctx.neigh_cfg,
                special_tags=s0.special_tags,
                special_codes=s0.special_codes, tag=s0.tag,
                gmask=s0.gmask)
            shear = neigh0.shear
            if shear is not None:
                from tpumd.md.verlet import _remap_shear
                shear = _remap_shear(neigh0.idx, idx, shear)
            neigh = neigh0.replace(
                idx=idx, sbits=sbits, xhold=s0.x,
                ago=jnp.zeros((), jnp.int32),
                max_count=max_count, overflow=over, shear=shear)
        self._check_overflow(neigh)
        self._carry = (s0, neigh, fstates, istep)
        if self.respa is not None:
            from tpumd.md.verlet import (compute_forces_cats,
                                         respa_setup_hooks)
            flev = tuple(compute_forces_cats(s0, neigh, ctx, c, self._consts)
                         for c in self.respa[1])
            flev, fstates = respa_setup_hooks(s0, flev, fstates, ctx)
            self._carry = (s0, neigh, fstates, istep, flev)
        return ctx

    def _regrow(self, snapshot):
        """Grow neighbor capacities after an overflow; rebuild from snapshot."""
        neigh0 = snapshot[1]
        stags = getattr(neigh0, "shear_tags", None)
        if stags is not None:
            full = np.asarray(jax.device_get(stags)) != 0
            if full.size and bool(full.all(axis=-1).any()):
                # growing the cell cap cannot fix a saturated history
                # table (KH is a compiled constant) — fail loudly instead
                # of silently dropping contacts or regrowing forever
                raise RuntimeError(
                    f"granular contact-history table saturated at step "
                    f"{self.step}: an atom holds {full.shape[-1]} live "
                    f"contacts (KH limit, ops/cellgrid_gran.py) — "
                    f"polydisperse/compressed pack exceeds the compact "
                    f"history capacity; raise KH")
        mc = float(jax.device_get(neigh0.max_count))
        if self._ctx.is_cellgrid:
            self._cap_override = int(np.ceil(max(
                self._neigh_cfg.cap * 1.5, mc * 1.3) / 8) * 8)
        else:
            # grow BOTH capacities: the overflow flag is
            # cell_over | (max_count > kmax), and growing only kmax when
            # the per-cell cap is the violated one loops forever
            # (kmax observed ballooning 112 -> 1758 on the lj melt)
            self._kmax_override = int(
                max(self._neigh_cfg.kmax * 1.5, mc * 1.3) + 8)
            self._cellcap_override = int(
                np.ceil(self._neigh_cfg.cell_cap * 1.5 / 8) * 8)
        return self._rebuild_ctx(snapshot)

    def _barostat_active(self) -> bool:
        return any(getattr(fx, "pstat", False)
                   or getattr(fx, "box_change", False)
                   for fx in self.fixes)

    def _revalidate_geometry(self):
        """Re-check the cell decomposition against the (possibly deformed)
        box after a segment: the stencil silently misses pairs once a cell
        edge shrinks below cutneigh (the reference re-runs setup_bins on
        box change, src/neighbor.cpp).  Rebuilds the config when violated."""
        cutneigh = self.max_cutoff() + self.skin
        ell = np.asarray(
            jax.device_get(self._carry[0].box.lengths), dtype=np.float64)
        if (ell < 2.0 * cutneigh).any():
            raise RuntimeError(
                f"box shrank below 2*cutneigh at step {self.step}: "
                f"lengths {ell}, cutneigh {cutneigh:.4f}")
        cfg = self._neigh_cfg
        dims = np.array([cfg.nx, cfg.ny, cfg.nz], dtype=np.float64)
        if (ell / dims < cutneigh).any():
            # widen the barostat bracket so the NEXT shrink of the same
            # relative size fits without another reconfig/recompile
            self._baro_margin = getattr(self, "_baro_margin", 1.12) * 1.10
            self._rebuild_ctx(self._carry)

    def recompute_output(self):
        """Refresh forces/energies/virial after external state mutation."""
        if self._ctx is None:
            return
        s, neigh, fstates, istep = self._carry[:4]
        f, energies, virial, torque = eval_energies(
            s, neigh, self._ctx, consts=self._consts)
        s = s.replace(f=f)
        if torque is not None:
            s = s.replace(torque=torque)
        self._carry = (s, neigh, fstates, istep)
        self.state = s
        for i, fx in enumerate(self.fixes):
            if getattr(fx, "contributes_virial", False):
                virial = virial + fx.virial_contrib(fstates[i])
        self._last_energies = energies
        self._last_virial = virial

    # ------------------------------------------------------------------ thermo
    def _thermo_scal(self):
        u = self.units
        return jnp.asarray([self.dof(), u.boltz, u.mvv2e], self.dtype)

    def _thermo_mass_arr(self):
        if self._carry[0].rmass is not None:
            return None
        return jnp.asarray(self.mass, self.dtype)

    def thermo_values(self) -> dict:
        s, neigh, fstates, _ = self._carry[:4]
        # one fused device computation + ONE host transfer (tunnel round
        # trips are expensive on remote TPU backends)
        from tpumd.md.verlet import pack_thermo_jit
        packed = pack_thermo_jit(
            s, self._last_energies, self._last_virial,
            self._thermo_scal(), self._thermo_mass_arr())
        vals_h = np.asarray(jax.device_get(packed), dtype=np.float64)
        self._escape_checks(s)
        return self._vals_from_packed(vals_h)

    def _escape_checks(self, s):
        # per-dimension fixed-boundary escape check
        if not all(s.box.periodic) and self.lost_policy != "ignore":
            fixed_dims = [d for d, tok in enumerate(self.boundary)
                          if tok[0] == "f" or (len(tok) > 1
                                               and tok[1] == "f")]
            if fixed_dims:
                xh = np.asarray(jax.device_get(s.x), np.float64)
                tagh = np.asarray(jax.device_get(s.tag))
                lo = np.asarray(jax.device_get(s.box.lo), np.float64)
                hi = np.asarray(jax.device_get(s.box.hi), np.float64)
                lost = 0
                for d, tok in enumerate(self.boundary):
                    clo = tok[0]
                    chi = tok[1] if len(tok) > 1 else tok[0]
                    v = tagh > 0
                    if clo == "f":
                        lost += int(((xh[:, d] < lo[d]) & v).sum())
                    if chi == "f":
                        lost += int(((xh[:, d] > hi[d]) & v).sum())
                if lost:
                    msg = (f"Lost atoms: {lost} outside fixed boundaries "
                           f"at step {self.step}")
                    if self.lost_policy == "error":
                        raise RuntimeError(msg)
                    self._log("WARNING: " + msg)

    def _vals_from_packed(self, vals_h) -> dict:
        """Thermo dict from one pack_thermo row (layout: verlet.pack_thermo).

        Host-side finishing of the thermo columns (Thermo::compute_*,
        src/thermo.cpp) — shared by the per-stop path and the streamed
        run drain."""
        u = self.units
        dof = self.dof()
        # unconditional atom-count check every thermo step
        # (Thermo::lost_check counts regardless of boundary style,
        # src/thermo.cpp:382) — rides the packed transfer for free
        ncur = int(vals_h[3])
        if ncur != self.natoms and self.lost_policy != "ignore":
            msg = (f"Lost atoms: original {self.natoms} current {ncur} "
                   f"at step {self.step}")
            if self.lost_policy == "error":
                raise RuntimeError(msg)
            self._log("WARNING: " + msg)
        if not np.isfinite(vals_h).all():
            # the reference's lost-atom / unstable-simulation checks
            # (Thermo::lost_check, Domain "non-numeric atom coords")
            raise RuntimeError(
                f"Non-finite thermodynamics at step {self.step} — "
                "simulation unstable (bad dynamics, overlapping atoms, or "
                "too-large timestep)")
        ekeys = sorted(self._last_energies)
        t, vol, vir3 = float(vals_h[0]), float(vals_h[1]), float(vals_h[2])
        ell = vals_h[4:7]
        tilt_np = vals_h[7:10]
        e = dict(zip(ekeys, vals_h[10:].tolist()))
        ke = computes.kinetic_energy(t, dof, u.boltz)
        # long-range LJ tail corrections (Thermo::compute_evdwl,
        # ComputePressure: ptail/volume added to each diagonal term)
        etail = ptail = 0.0
        if self.pair is not None and getattr(self.pair, "tail_flag", False):
            etail = self.pair.etail / vol
            ptail = self.dimension * self.pair.ptail / vol
        press = ((dof * u.boltz * t + vir3 + ptail)
                 / (self.dimension * vol) * u.nktv2p)
        epair = e["evdwl"] + etail + e["ecoul"] + e["elong"]
        emol = e["ebond"] + e["eangle"] + e["edihed"] + e["eimp"]
        pe = epair + emol
        norm = self.natoms if self.thermo_norm else 1
        if getattr(self, "_mass_sum", None) is None:
            self._mass_sum = float(self.mass_per_atom_np().sum())
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
            "lx": float(ell[0]), "ly": float(ell[1]), "lz": float(ell[2]),
            "xy": float(tilt_np[0]), "xz": float(tilt_np[1]),
            "yz": float(tilt_np[2]),
            "evdwl": e["evdwl"] / norm, "ecoul": e["ecoul"] / norm,
            "elong": e["elong"] / norm, "ebond": e["ebond"] / norm,
            "eangle": e["eangle"] / norm, "edihed": e["edihed"] / norm,
            "eimp": e["eimp"] / norm,
            "atoms": self.natoms,
            "density": self.units.mv2d * self._mass_sum / vol,
        }
        self.last_thermo = vals
        return vals

    _THERMO_HEADERS = {
        "step": "Step", "temp": "Temp", "epair": "E_pair", "emol": "E_mol",
        "etotal": "TotEng", "press": "Press", "pe": "PotEng", "ke": "KinEng",
        "vol": "Volume",
    }

    _MULTI_FIELDS = [
        ("TotEng", "etotal"), ("KinEng", "ke"), ("Temp", "temp"),
        ("PotEng", "pe"), ("E_bond", "ebond"), ("E_angle", "eangle"),
        ("E_dihed", "edihed"), ("E_impro", "eimp"), ("E_vdwl", "evdwl"),
        ("E_coul", "ecoul"), ("E_long", "elong"), ("Press", "press"),
    ]

    def _thermo_header(self):
        if self.thermo_multi:
            return
        line = " ".join(self._THERMO_HEADERS.get(k, k).ljust(12)
                        for k in self.thermo_style)
        self._log(line.rstrip())

    def _thermo_line_multi(self, vals):
        """thermo_style multi (src/thermo.cpp FORMAT_MULTI_HEADER + 3
        'name = value' fields per line; Volume appended when the box
        changes, i.e. under a barostat)."""
        cpu = time.perf_counter() - getattr(self, "_cpu_start",
                                            time.perf_counter())
        self._log(f"---------------- Step {self.step:8d} ----- "
                  f"CPU = {cpu:11.4f} (sec) ----------------")
        fields = list(self._MULTI_FIELDS)
        if self._barostat_active():
            fields.append(("Volume", "vol"))
        parts = []
        for i, (label, key) in enumerate(fields):
            parts.append(f"{label:<8} = {vals[key]:14.4f}")
            if (i + 1) % 3 == 0 or i == len(fields) - 1:
                self._log(" ".join(parts) + " ")
                parts = []

    def _thermo_value(self, vals, key):
        if key in vals:
            return vals[key]
        if key.startswith("c_"):
            name = key[2:]
            idx = None
            if "[" in name:
                name, rest = name.split("[", 1)
                idx = int(rest.rstrip("]")) - 1
            c = self.computes[name]
            out = c.evaluate(self)
            # lj-units thermo normalizes extensive compute outputs
            # (Thermo::compute_compute with extscalar/extvector)
            norm = (self.natoms
                    if getattr(c, "extensive", False) and self.thermo_norm
                    else 1)
            if idx is None:
                if hasattr(c, "evaluate_scalar"):
                    return float(c.evaluate_scalar(out)) / norm
                return float(out) / norm
            if np.ndim(out) == 0:
                # scalar compute with a side vector (e.g. group/group:
                # scalar = energy, [1..3] = force on the group)
                return float(c.vector[idx]) / norm
            return float(out[idx]) / norm
        if key.startswith("v_"):
            return float(self.script.evaluate_variable(key[2:]))
        if key.startswith("f_"):
            name = key[2:]
            idx = None
            if "[" in name:
                name, rest = name.split("[", 1)
                idx = int(rest.rstrip("]")) - 1
            for fx in self.fixes:
                if getattr(fx, "id", None) == name:
                    out = fx.output(self)
                    return float(out if idx is None else
                                 np.asarray(out)[idx])
            raise KeyError(f"no fix {name!r} with output")
        raise KeyError(f"unknown thermo keyword {key!r}")

    _hist_saturated_warned = False

    def _thermo_line(self):
        # compact granular-history saturation guard: an atom whose KH
        # slots are all occupied may have silently dropped contacts
        # (cellgrid_gran compacts touching contacts into KH=12 slots)
        st = getattr(self._carry[1], "shear_tags", None)
        if (st is not None and getattr(st, "ndim", 0) == 2
                and not self._hist_saturated_warned):
            if bool(jax.device_get(jnp.all(st != 0, axis=1).any())):
                self._hist_saturated_warned = True
                self._log("WARNING: granular contact-history slots "
                          "saturated for some atom — contacts beyond "
                          f"{st.shape[1]} per atom lose shear history")
        vals = self.thermo_values()
        self._emit_vals(vals)

    def _emit_vals(self, vals):
        # structured thermo history (PyLammps.runs reads this back)
        self.thermo_rows.append(dict(vals))
        if self.thermo_multi:
            return self._thermo_line_multi(vals)
        parts = []
        for k in self.thermo_style:
            v = self._thermo_value(vals, k)
            vals[k] = v          # custom columns land in last_thermo too
            if k == "step":
                parts.append(f"{v:8d}")
            else:
                parts.append(f"{v:12.8g}")
        self._log(" ".join(parts))

    verbose = True

    log_fh = None       # `log` command file handle (src/lammps.cpp logfile)

    def _log(self, line: str):
        self.log_lines.append(line)
        if self.log_fh is not None:
            self.log_fh.write(line + "\n")
            self.log_fh.flush()
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
