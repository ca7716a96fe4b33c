"""LAMMPS-dialect input-script front end.

Reimplements the command subset of the reference's Input interpreter
(src/input.cpp:195 file loop, :382 line parse, :764 dispatch) needed by
the benchmark decks and common workflows: line continuation (&), comment
stripping, ``$x``/``${name}`` variable substitution, and an order-sensitive
command state machine driving a ``Simulation``.
"""

from __future__ import annotations

import os
import re

import numpy as np
import jax
import jax.numpy as jnp

from tpumd.core.create import create_atoms_lattice
from tpumd.core.lattice import Lattice
from tpumd.core.region import BlockRegion
from tpumd.core.state import Box, make_state
from tpumd.core.velocity_cmd import velocity_create_geom
from tpumd.io.read_data import build_special, read_data
from tpumd.md.fixes import FixNVE
from tpumd.md.simulation import Simulation
from tpumd.models.registry import create_bonded_style, create_pair_style


class ScriptError(RuntimeError):
    pass


def _evaluate(expr: str) -> float:
    """Evaluate an 'equal'-style arithmetic expression (safe subset)."""
    if not re.fullmatch(r"[\d\s+*/().eE^<>=!&|-]*", expr):
        raise ScriptError(f"Unsupported expression: {expr!r}")
    return float(eval(expr.replace("^", "**"), {"__builtins__": {}}, {}))


class LammpsScript:
    """Parses and executes a LAMMPS input script against a Simulation."""

    def __init__(self, dtype=jnp.float64, var_overrides=None, data_dir="."):
        self.sim: Simulation | None = None
        self.dtype = dtype
        self.variables: dict[str, tuple[str, str]] = {}  # name -> (style, value)
        if var_overrides:
            for k, v in var_overrides.items():
                self.variables[k] = ("index", str(v))
        self.data_dir = data_dir
        self.lattice: Lattice | None = None
        self.regions: dict[str, object] = {}
        self.box = None
        self._atoms_x: list[np.ndarray] = []
        self._atoms_type: list[np.ndarray] = []
        self._atoms_q: list[np.ndarray] = []
        self._atoms_mol: list[np.ndarray] = []
        self._atoms_image: list[np.ndarray] = []
        self._atoms_v: list[np.ndarray] = []
        self._atoms_tag: list[np.ndarray] = []
        self.last_error: str | None = None  # library error state
        self._molid_next = 1
        # topology accumulated by create_atoms mol (1-based tags)
        self._topo_acc: dict[str, list[np.ndarray]] = {
            "bond": [], "angle": [], "dihedral": [], "improper": []}
        self.atom_style = "atomic"
        self.pair_style_args = None
        self.pending_pair_coeffs = []
        self.pending_bond = None
        self.pending_velocity = []
        self._units_name = "lj"
        self._data = None      # parsed data file (molecular systems)
        self._history: list[str] = []   # raw executed lines (replica replay)
        self._world_index = 0           # Universe partition index analog
        # script control flow (Input::file/jump, src/input.cpp)
        self._frames: list[dict] = []   # program counter stack
        self._skip_jump = False         # set when `next` exhausts a var
        self._var_lists: dict[str, tuple] = {}   # index/loop value lists
        self._atomfiles: dict[str, tuple] = {}   # name -> (sections, pos)
        self._python_funcs: dict[str, dict] = {}  # python command registry

    # -------------------------------------------------------------- plumbing
    def run_file(self, path: str):
        self.data_dir = os.path.dirname(os.path.abspath(path))
        with open(path) as fh:
            text = fh.read()
        self.run_string(text)

    @staticmethod
    def _to_logical(text: str):
        logical = []
        cont = ""
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].rstrip()
            if not line.strip() and not cont:
                continue
            if line.rstrip().endswith("&"):
                cont += line.rstrip()[:-1] + " "
                continue
            logical.append(cont + line)
            cont = ""
        return logical

    def run_string(self, text: str):
        self._run_program(self._to_logical(text))

    def _run_program(self, lines):
        """Program-counter-driven execution so jump/label/next can loop
        (Input::file, src/input.cpp)."""
        frame = {"lines": lines, "pc": 0}
        self._frames.append(frame)
        try:
            while frame["pc"] < len(frame["lines"]):
                line = frame["lines"][frame["pc"]]
                frame["pc"] += 1
                self.execute(line)
        finally:
            self._frames.pop()

    def substitute(self, line: str) -> str:
        def repl(m):
            name = m.group(1) or m.group(2)
            return self._var_value(name)
        return re.sub(r"\$\{(\w+)\}|\$(\w)", repl, line)

    _THERMO_VARS = ("etotal", "epair", "emol", "press", "temp", "step",
                    "atoms", "density", "vol", "pe", "ke", "lx", "ly", "lz")

    def _var_value(self, name: str) -> str:
        if name not in self.variables:
            raise ScriptError(f"Substitution for undefined variable {name!r}")
        style, value = self.variables[name]
        if style in ("equal", "internal"):
            v = float(self.evaluate_variable(name))
            return repr(int(v)) if v == int(v) else repr(v)
        if style == "world":
            return value[self._world_index]
        if style in ("format", "getenv", "python"):
            return str(self.evaluate_variable(name))
        if style == "atomfile":
            raise ScriptError(
                f"cannot substitute atomfile variable {name!r} inline")
        return value

    @staticmethod
    def _split(line: str):
        """Whitespace split honoring double-quoted groups (Input::parse)."""
        out, cur, q = [], [], False
        for ch in line:
            if ch == '"':
                q = not q
                continue
            if ch.isspace() and not q:
                if cur:
                    out.append("".join(cur))
                    cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out

    def execute(self, line: str):
        line = line.strip()
        if not line:
            return
        self._history.append(line)
        # defer ${...} substitution inside fix print strings to runtime
        if not line.startswith("fix") or " print " not in line:
            line = self.substitute(line).strip()
        args = self._split(line)
        cmd, args = args[0], args[1:]
        handler = getattr(self, "cmd_" + cmd.replace("/", "_"), None)
        if handler is None:
            self.last_error = f"Unknown command: {cmd}"
            raise ScriptError(f"Unknown command: {cmd}")
        try:
            handler(args)
        except Exception as e:  # library error state (src/library.cpp
            self.last_error = str(e)  # lammps_has_error contract)
            raise

    def _require_sim(self) -> Simulation:
        if self.sim is None:
            self.sim = Simulation(units=self._units_name, dtype=self.dtype)
        self.sim.script = self
        return self.sim

    # -------------------------------------------------------------- commands
    def cmd_variable(self, a):
        name, style = a[0], a[1]
        if style == "index":
            if name not in self.variables:  # index vars keep first value
                self.variables[name] = ("index", a[2])
                self._var_lists[name] = (list(a[2:]), 0)
        elif style in ("equal", "string", "atom", "internal"):
            self.variables[name] = (style, " ".join(a[2:]))
        elif style == "world":
            # per-partition values (src/variable.cpp WORLD); partition =
            # replica index in the temper runner
            self.variables[name] = ("world", a[2:])
        elif style == "loop":
            if name not in self.variables:
                n = int(a[2])
                self.variables[name] = ("index", "1")
                self._var_lists[name] = (
                    [str(i) for i in range(1, n + 1)], 0)
        elif style == "format":
            # variable x format v_src %fmt (src/variable.h FORMAT)
            self.variables[name] = ("format", (a[2].removeprefix("v_"),
                                               a[3]))
        elif style == "getenv":
            self.variables[name] = ("getenv", a[2])
        elif style == "python":
            self.variables[name] = ("python", a[2])
        elif style == "atomfile":
            path = a[2]
            if not os.path.isabs(path):
                path = os.path.join(self.data_dir, path)
            self._atomfiles[name] = (self._read_atomfile(path), 0)
            self.variables[name] = ("atomfile", a[2])
        elif style == "delete":
            self.variables.pop(name, None)
            self._var_lists.pop(name, None)
            self._atomfiles.pop(name, None)
        else:
            raise ScriptError(f"variable style {style} not supported")

    @staticmethod
    def _read_atomfile(path):
        """Parse all sections of an atomfile-style variable file
        (Variable::reader ATOMFILE, src/variable.cpp): each section is a
        count line then 'ID value' rows; values default to 0."""
        sections = []
        with open(path) as fh:
            toks = [ln.split("#", 1)[0].split() for ln in fh]
        toks = [t for t in toks if t]
        i = 0
        while i < len(toks):
            n = int(toks[i][0])
            rows = {int(t[0]): float(t[1]) for t in toks[i + 1:i + 1 + n]}
            sections.append(rows)
            i += 1 + n
        return sections

    def _atomfile_values(self, name):
        sections, pos = self._atomfiles[name]
        rows = sections[pos]
        self._finalize_atoms()
        sim = self._require_sim()
        out = np.zeros(sim.natoms)
        for tag, val in rows.items():
            if 1 <= tag <= sim.natoms:
                out[tag - 1] = val
        return out

    def cmd_label(self, a):
        pass

    def cmd_next(self, a):
        """next var1 [var2 ...]: advance index/loop/atomfile variables;
        an exhausted variable is deleted and the next jump command is
        skipped (src/variable.cpp Variable::next)."""
        exhausted = False
        for name in a:
            if name in self._var_lists:
                vals, pos = self._var_lists[name]
                pos += 1
                if pos >= len(vals):
                    self.variables.pop(name, None)
                    self._var_lists.pop(name, None)
                    exhausted = True
                else:
                    self._var_lists[name] = (vals, pos)
                    self.variables[name] = ("index", vals[pos])
            elif name in self._atomfiles:
                secs, pos = self._atomfiles[name]
                pos += 1
                if pos >= len(secs):
                    self.variables.pop(name, None)
                    self._atomfiles.pop(name, None)
                    exhausted = True
                else:
                    self._atomfiles[name] = (secs, pos)
            else:
                raise ScriptError(f"next on non-index variable {name!r}")
        if exhausted:
            self._skip_jump = True

    def cmd_jump(self, a):
        if self._skip_jump:
            self._skip_jump = False
            return
        if not self._frames:
            raise ScriptError("jump outside a running script")
        frame = self._frames[-1]
        fname = a[0]
        if fname != "SELF":
            path = fname if os.path.isabs(fname) \
                else os.path.join(self.data_dir, fname)
            with open(path) as fh:
                frame["lines"] = self._to_logical(fh.read())
            frame["pc"] = 0
        if len(a) > 1:
            label = a[1]
            for i, ln in enumerate(frame["lines"]):
                t = ln.split()
                if len(t) >= 2 and t[0] == "label" and t[1] == label:
                    frame["pc"] = i
                    break
            else:
                raise ScriptError(f"label {label!r} not found")

    def cmd_if(self, a):
        """if "cond" then "cmd"... [elif "cond" "cmd"...] [else "cmd"...]
        (src/input.cpp Input::ifthenelse); conditions run through the
        formula evaluator."""
        from tpumd.script.formula import Formula, SimFormulaContext

        def truthy(cond):
            text = self.substitute(cond)
            # string equality when a side is non-numeric
            # (Variable::evaluate string-compare branch)
            m = re.fullmatch(r"\s*(\S+)\s*(==|!=)\s*(\S+)\s*", text)
            if m:
                lhs, op, rhs = m.groups()
                try:
                    float(lhs), float(rhs)
                except ValueError:
                    return (lhs == rhs) == (op == "==")
            ctx = SimFormulaContext(self.sim, self)
            return float(Formula(text).evaluate(ctx)) != 0

        i = 0
        branch_taken = False
        while i < len(a):
            if i == 0 or a[i] == "elif":
                cond = a[i + 1] if a[i] == "elif" else a[0]
                j = i + (2 if a[i] == "elif" else 1)
                if a[j] == "then":
                    j += 1
                cmds = []
                while j < len(a) and a[j] not in ("elif", "else"):
                    cmds.append(a[j])
                    j += 1
                if not branch_taken and truthy(cond):
                    branch_taken = True
                    for c in cmds:
                        self.execute(c)
                i = j
            elif a[i] == "else":
                cmds = a[i + 1:]
                if not branch_taken:
                    for c in cmds:
                        self.execute(c)
                return
            else:
                raise ScriptError(f"if: unexpected token {a[i]!r}")

    def cmd_include(self, a):
        path = a[0] if os.path.isabs(a[0]) \
            else os.path.join(self.data_dir, a[0])
        with open(path) as fh:
            self._run_program(self._to_logical(fh.read()))

    def cmd_shell(self, a):
        """shell cd/mkdir/rm/putenv builtins + external commands
        (src/input.cpp Input::shell)."""
        op = a[0]
        if op == "cd":
            os.chdir(a[1])
        elif op == "mkdir":
            for d in a[1:]:
                os.makedirs(d, exist_ok=True)
        elif op == "rm":
            for f in a[1:]:
                if os.path.exists(f):
                    os.remove(f)
        elif op == "putenv":
            for kv in a[1:]:
                k, _, v = kv.partition("=")
                os.environ[k] = v
        else:
            import subprocess
            subprocess.run(a, check=False)

    def cmd_python(self, a):
        """python func input N args... return v_x format str
        {file f.py | here "src" | exists} (src/python.cpp): registers a
        python function callable through python-style variables."""
        fname = a[0]
        spec = {"inputs": [], "return": None, "format": None}
        src = None
        i = 1
        while i < len(a):
            k = a[i]
            if k == "input":
                n = int(a[i + 1])
                spec["inputs"] = list(a[i + 2:i + 2 + n])
                i += 2 + n
            elif k == "return":
                spec["return"] = a[i + 1].removeprefix("v_")
                i += 2
            elif k == "format":
                spec["format"] = a[i + 1]
                i += 2
            elif k == "file":
                path = a[i + 1] if os.path.isabs(a[i + 1]) \
                    else os.path.join(self.data_dir, a[i + 1])
                src = open(path).read()
                i += 2
            elif k == "here":
                src = a[i + 1]
                i += 2
            elif k == "exists":
                i += 1
            else:
                raise ScriptError(f"python keyword {k!r} not supported")
        ns = self._python_funcs.get("_ns", {})
        if src is not None:
            exec(src, ns)
        self._python_funcs["_ns"] = ns
        if fname not in ns:
            raise ScriptError(f"python function {fname!r} not defined")
        spec["func"] = ns[fname]
        self._python_funcs[fname] = spec

    def _python_call(self, fname):
        spec = self._python_funcs.get(fname)
        if spec is None:
            raise ScriptError(f"python function {fname!r} not registered")
        args = []
        for tok in spec["inputs"]:
            if tok.startswith("v_"):
                args.append(self.evaluate_variable(tok[2:]))
            elif tok == "SELF":
                args.append(self)
            else:
                try:
                    args.append(float(tok) if "." in tok or "e" in tok
                                else int(tok))
                except ValueError:
                    args.append(tok)
        out = spec["func"](*args)
        fmt = spec["format"]
        if fmt:
            rc = fmt[-1]
            if rc == "i":
                return int(out)
            if rc == "f":
                return float(out)
            if rc == "s":
                return str(out)
        return out

    def evaluate_variable(self, name: str):
        """Evaluate a variable to its value (float, ndarray or str) —
        Variable::evaluate / compute_equal / compute_atom."""
        if name not in self.variables:
            raise ScriptError(f"undefined variable {name!r}")
        style, value = self.variables[name]
        if style in ("index", "string"):
            return value
        if style == "getenv":
            return os.environ.get(value, "")
        if style == "format":
            src, fmt = value
            return fmt % float(self.evaluate_variable(src))
        if style == "python":
            return self._python_call(value)
        if style == "atomfile":
            return self._atomfile_values(name)
        from tpumd.script.formula import Formula, SimFormulaContext
        f = Formula(self.substitute(value))
        return f.evaluate(SimFormulaContext(self.sim, self))

    def cmd_units(self, a):
        self._units_name = a[0]
        self.sim = Simulation(units=a[0], dtype=self.dtype)
        self.sim.script = self

    def cmd_dimension(self, a):
        self._require_sim().dimension = int(a[0])

    def cmd_atom_style(self, a):
        from tpumd.core.atomvec import get_style
        get_style(a[0])   # validates against the AtomVec registry
        self.atom_style = a[0]

    def cmd_boundary(self, a):
        sim = self._require_sim()
        toks = []
        for tok in a[:3]:
            if not all(c in "pfsm" for c in tok) or len(tok) > 2:
                raise ScriptError(f"boundary token {tok!r} not supported")
            toks.append(tok)
        while len(toks) < 3:
            toks.append("p")
        sim.boundary = tuple(toks)

    def cmd_newton(self, a):
        pass  # physics-identical by construction (i-centric full lists)

    def cmd_comm_modify(self, a):
        pass  # ghost velocity comm is implicit (no ghosts)

    def cmd_lattice(self, a):
        sim = self._require_sim()
        self.lattice = Lattice(a[0], float(a[1]), units=sim.units.name,
                               dimension=sim.dimension, args=a[2:])

    def cmd_region(self, a):
        name, style = a[0], a[1]

        def wrap_side(region, rest):
            # side out (Region::options, src/region.cpp)
            if "side" in rest and rest[rest.index("side") + 1] == "out":
                from tpumd.core.region import OutsideRegion
                return OutsideRegion(region)
            return region

        def sp_of(rest, dims=(0, 1, 2)):
            # lattice-units scale factors per dim (1.0 with units box)
            if self.lattice is not None and "units" not in rest:
                sp = self.lattice.spacing
                return [sp[c] for c in dims]
            return [1.0, 1.0, 1.0]

        if style == "sphere":
            # region name sphere x y z r (src/region_sphere.cpp);
            # lattice-units scaling like block
            vals = [float(v) for v in a[2:6]]
            sp = sp_of(a[6:])
            vals = [vals[0] * sp[0], vals[1] * sp[1], vals[2] * sp[2],
                    vals[3] * sp[0]]
            from tpumd.core.region import SphereRegion
            self.regions[name] = wrap_side(
                SphereRegion(vals[:3], vals[3]), a[6:])
            return
        if style == "cylinder":
            # region name cylinder dim c1 c2 radius lo hi
            # (src/region_cylinder.cpp); lattice scaling: c1/c2/radius by
            # the off-axis spacings, lo/hi by the axis spacing
            from tpumd.core.region import CylinderRegion
            dim = "xyz".index(a[2])
            o1, o2 = [c for c in range(3) if c != dim]
            rest = a[8:]
            sp = sp_of(rest)

            def bnd(tok, lohi):
                if tok in ("INF", "EDGE"):
                    return float("-inf") if lohi == 0 else float("inf")
                return float(tok) * sp[dim]

            self.regions[name] = wrap_side(CylinderRegion(
                dim, float(a[3]) * sp[o1], float(a[4]) * sp[o2],
                float(a[5]) * sp[o1], bnd(a[6], 0), bnd(a[7], 1)), rest)
            return
        if style == "cone":
            # region name cone dim c1 c2 radlo radhi lo hi
            # (src/region_cone.cpp)
            from tpumd.core.region import ConeRegion
            dim = "xyz".index(a[2])
            o1, o2 = [c for c in range(3) if c != dim]
            rest = a[9:]
            sp = sp_of(rest)
            self.regions[name] = wrap_side(ConeRegion(
                dim, float(a[3]) * sp[o1], float(a[4]) * sp[o2],
                float(a[5]) * sp[o1], float(a[6]) * sp[o1],
                float(a[7]) * sp[dim], float(a[8]) * sp[dim]), rest)
            return
        if style == "plane":
            # region name plane px py pz nx ny nz (src/region_plane.cpp)
            from tpumd.core.region import PlaneRegion
            rest = a[8:]
            sp = sp_of(rest)
            pt = [float(a[2 + c]) * sp[c] for c in range(3)]
            self.regions[name] = wrap_side(
                PlaneRegion(pt, [float(v) for v in a[5:8]]), rest)
            return
        if style == "ellipsoid":
            # region name ellipsoid x y z a b c (src/region_ellipsoid.cpp)
            from tpumd.core.region import EllipsoidRegion
            rest = a[8:]
            sp = sp_of(rest)
            ctr = [float(a[2 + c]) * sp[c] for c in range(3)]
            abc = [float(a[5 + c]) * sp[c] for c in range(3)]
            self.regions[name] = wrap_side(EllipsoidRegion(ctr, abc), rest)
            return
        if style in ("union", "intersect"):
            # region name union N reg1 ... regN (src/region_union.cpp)
            from tpumd.core.region import IntersectRegion, UnionRegion
            nreg = int(a[2])
            subs = []
            for rn in a[3:3 + nreg]:
                if rn not in self.regions:
                    raise ScriptError(f"undefined region {rn!r}")
                subs.append(self.regions[rn])
            cls = UnionRegion if style == "union" else IntersectRegion
            self.regions[name] = wrap_side(cls(subs), a[3 + nreg:])
            return
        if style not in ("block", "prism"):
            raise ScriptError(f"region style {style} not supported yet")
        nv = 6 if style == "block" else 9

        def bound(tok, k):
            # INF/EDGE resolve directionally: lo bounds (even k) open
            # toward -infinity (Region::parse, src/region.cpp EDGE/INF);
            # atoms are always inside the box, so EDGE uses the same
            # unbounded selection
            if tok in ("INF", "EDGE"):
                return float("-inf") if k % 2 == 0 else float("inf")
            return float(tok)

        vals = [bound(v, k) for k, v in enumerate(a[2:2 + nv])]
        rest = a[2 + nv:]
        # region defined in lattice units when a lattice exists
        # (units lattice default)
        if self.lattice is not None and "units" not in rest:
            sp = self.lattice.spacing
            lo = [vals[0] * sp[0], vals[2] * sp[1], vals[4] * sp[2]]
            hi = [vals[1] * sp[0], vals[3] * sp[1], vals[5] * sp[2]]
            # xy displaces x per unit y etc (region_prism.cpp scaling)
            tilt = ([vals[6] * sp[0], vals[7] * sp[0], vals[8] * sp[1]]
                    if style == "prism" else None)
        else:
            lo = [vals[0], vals[2], vals[4]]
            hi = [vals[1], vals[3], vals[5]]
            tilt = vals[6:9] if style == "prism" else None
        if style == "prism":
            from tpumd.core.region import PrismRegion
            self.regions[name] = wrap_side(PrismRegion(lo, hi, tilt), rest)
        else:
            self.regions[name] = wrap_side(BlockRegion(lo, hi), rest)

    def cmd_create_box(self, a):
        ntypes = int(a[0])
        region = self.regions[a[1]]
        lo, hi = region.bounding_box()
        self.box = (lo, hi)
        self._box_tilt = getattr(region, "tilt", None)
        sim = self._require_sim()
        sim.ntypes = ntypes
        sim.mass = np.zeros(ntypes + 1)
        i = 2
        while i < len(a):
            key = a[i]
            if key.endswith("/types") and key.split("/")[0] in (
                    "bond", "angle", "dihedral", "improper"):
                sim.bonded_ntypes[key.split("/")[0]] = int(a[i + 1])
                i += 2
            elif key.startswith("extra/"):   # capacity hints; padded anyway
                i += 2
            else:
                raise ScriptError(f"create_box keyword {key} not supported")
        self._materialize_styles()

    def cmd_create_atoms(self, a):
        type_id = int(a[0])
        style = a[1]
        rest = list(a[3:] if style == "region" else
                    a[5:] if style == "single" else a[2:])
        mol = molseed = None
        i = 0
        while i < len(rest):
            if rest[i] == "mol":
                mol = self.sim.molecules[rest[i + 1]]
                molseed = int(rest[i + 2])
                i += 3
            else:
                raise ScriptError(
                    f"create_atoms keyword {rest[i]} not supported")
        lo, hi = self.box
        if style == "box":
            x, t = create_atoms_lattice(self.lattice, None, lo, hi, type_id)
        elif style == "region":
            x, t = create_atoms_lattice(self.lattice, self.regions[a[2]],
                                        lo, hi, type_id, fill_box=False)
        elif style == "single":
            # coordinates in lattice units when a lattice exists
            # (CreateAtoms single, src/create_atoms.cpp scaleflag)
            pt = np.array([float(a[2]), float(a[3]), float(a[4])])
            if self.lattice is not None:
                pt = pt * np.asarray(self.lattice.spacing)
            x = pt[None, :]
            t = np.full(1, type_id, np.int32)
        else:
            raise ScriptError(f"create_atoms style {style} not supported")
        if mol is None:
            self._atoms_x.append(x)
            self._atoms_type.append(t)
            self._atoms_q.append(None)
            self._atoms_mol.append(None)
            self._atoms_image.append(None)
            self._atoms_v.append(None)
            self._atoms_tag.append(None)
            return
        # one molecule per lattice site with a random orientation drawn in
        # site order (CreateAtoms::add_molecule, src/create_atoms.cpp:1376-
        # 1394: 3 uniforms for the axis, 1 for the angle)
        from tpumd.io.molecule import (axisangle_to_quat, norm3_np,
                                       quat_to_mat_np, rotate_place_np)
        from tpumd.utils.ranmars import RanMars
        rng = RanMars(molseed)
        nm = mol.natoms
        tag0 = sum(len(arr) for arr in self._atoms_x)
        coords = np.empty((len(x) * nm, 3), np.float64)
        for k, site in enumerate(x):
            r = np.array([rng.uniform() - 0.5 for _ in range(3)])
            r = norm3_np(r)
            theta = rng.uniform() * 2.0 * np.pi
            rotmat = quat_to_mat_np(axisangle_to_quat(r, theta))
            coords[k * nm:(k + 1) * nm] = rotate_place_np(
                mol.dx, rotmat, site)
        types = np.tile(np.asarray(mol.types, np.int32) + type_id, len(x))
        # reference remaps every created atom into the box at the end of
        # the command (src/create_atoms.cpp:617 -> Domain::remap) — the
        # stored coordinate feeds velocity loop geom's byte hash
        from tpumd.core.create import remap_host
        periodic = tuple(tok == "p" for tok in self.sim.boundary)
        img = remap_host(coords, np.asarray(lo, np.float64),
                         np.asarray(hi, np.float64), periodic)
        self._atoms_image.append(img)
        self._atoms_x.append(coords)
        self._atoms_type.append(types)
        self._atoms_v.append(None)
        self._atoms_tag.append(None)
        self._atoms_q.append(np.tile(
            mol.q if mol.q is not None else np.zeros(nm), len(x)))
        self._atoms_mol.append(
            np.repeat(np.arange(self._molid_next,
                                self._molid_next + len(x)), nm))
        self._molid_next += len(x)
        for kind, arr in (("bond", mol.bonds), ("angle", mol.angles),
                          ("dihedral", mol.dihedrals),
                          ("improper", mol.impropers)):
            if len(arr):
                per = np.tile(arr, (len(x), 1))
                offs = np.repeat(np.arange(len(x)) * nm, len(arr))[:, None]
                per = per.copy()
                per[:, 1:] += offs + tag0
                self._topo_acc[kind].append(per)

    def cmd_mass(self, a):
        sim = self._require_sim()
        if a[0] == "*":
            sim.mass[1:] = float(a[1])
        else:
            sim.mass[int(a[0])] = float(a[1])

    def cmd_set(self, a):
        """set group/type/region selector keyword values (src/set.cpp
        subset: charge, type)."""
        self._finalize_atoms()
        sim = self.sim
        style, ident = a[0], a[1]
        if style == "group":
            sel = self._group_sel_np(ident)
        elif style == "type":
            typ = np.asarray(jax.device_get(sim.state.type))
            sel = typ == int(ident)
        elif style == "region":
            x = np.asarray(jax.device_get(sim.state.x), np.float64)
            sel = self.regions[ident].inside(x)
        elif style == "atom":
            tag = np.asarray(jax.device_get(sim.state.tag))
            if ident == "*":
                sel = tag > 0
            elif ":" in ident:
                lo, hi = ident.split(":")[:2]
                sel = (tag >= int(lo)) & (tag <= int(hi))
            else:
                sel = tag == int(ident)
        else:
            raise ScriptError(f"set style {style} not supported")
        i = 2
        while i < len(a):
            key = a[i]
            if key.startswith(("i_", "d_")):
                # fix property/atom custom columns (tag-keyed store)
                store = getattr(sim, "custom_peratom", None)
                if store is None or key not in store:
                    raise ScriptError(
                        f"set {key}: no fix property/atom defines it")
                tag = np.asarray(jax.device_get(sim.state.tag))
                val = (int(a[i + 1]) if key.startswith("i_")
                       else float(a[i + 1]))
                store[key][tag[sel] - 1] = val
                i += 2
            elif key == "charge":
                q = (np.zeros(sim.state.x.shape[0])
                     if sim.state.q is None
                     else np.array(jax.device_get(sim.state.q), np.float64))
                q[sel] = float(a[i + 1])
                sim.state = sim.state.replace(
                    q=jnp.asarray(q, dtype=self.dtype))
                i += 2
            elif key == "type":
                t = np.array(jax.device_get(sim.state.type))
                t[sel] = int(a[i + 1])
                sim.state = sim.state.replace(
                    type=jnp.asarray(t, dtype=jnp.int32))
                i += 2
            else:
                raise ScriptError(f"set keyword {key} not supported")
        sim.invalidate_ctx()

    def _finalize_atoms(self):
        sim = self.sim
        if sim.state is None:
            x = np.concatenate(self._atoms_x)
            t = np.concatenate(self._atoms_type)
            lo, hi = self.box
            tilt = getattr(self, "_box_tilt", None)
            periodic = tuple(tok == "p" for tok in sim.boundary)
            if tilt is not None and np.any(np.asarray(tilt) != 0):
                box = Box.triclinic(np.asarray(lo), np.asarray(hi), tilt,
                                    dtype=self.dtype, periodic=periodic)
            else:
                box = Box.orthogonal(np.asarray(lo), np.asarray(hi),
                                     dtype=self.dtype, periodic=periodic)
            def _cat(segs, fallback_dtype, width=None):
                # per-create_atoms segments; None = zeros of that length
                if not any(s is not None for s in segs):
                    return None
                shape = (lambda n: (n,) if width is None else (n, width))
                return np.concatenate([
                    s if s is not None else
                    np.zeros(shape(len(xa)), fallback_dtype)
                    for s, xa in zip(segs, self._atoms_x)])

            v = _cat(self._atoms_v, np.float64, width=3)
            if v is None:
                v = np.zeros_like(x)
            tags = None
            if any(s is not None for s in self._atoms_tag):
                # driver-supplied ids (lammps_create_atoms); segments
                # without explicit ids get the next sequential tags
                parts, nxt = [], 1
                for seg, xa in zip(self._atoms_tag, self._atoms_x):
                    if seg is None:
                        seg = np.arange(nxt, nxt + len(xa), dtype=np.int64)
                    parts.append(seg)
                    nxt = max(nxt, int(seg.max()) + 1)
                tags = np.concatenate(parts).astype(np.int32)
            q = _cat(self._atoms_q, np.float64)
            if q is None and self.atom_style in ("charge", "full"):
                q = np.zeros(len(x))
            mol = _cat(self._atoms_mol, np.int32)
            if mol is not None:
                mol = mol.astype(np.int32)
            elif self.atom_style in ("full", "molecular"):
                mol = np.zeros(len(x), np.int32)
            image = _cat(self._atoms_image, np.int32, width=3)
            radius = rmass = omega = None
            if self.atom_style == "sphere":
                # AtomVecSphere::create_atom defaults: diameter 1.0,
                # density 1.0 -> rmass = 4/3 pi r^3
                # (src/atom_vec_sphere.cpp:create_atom)
                radius = np.full(len(x), 0.5)
                rmass = 4.0 / 3.0 * np.pi * radius**3
                omega = np.zeros_like(x)
            sim.state = make_state(x, v, t, box, tags=tags, q=q,
                                   molecule=mol, image=image,
                                   radius=radius, rmass=rmass, omega=omega,
                                   dtype=self.dtype)
            # topology accumulated by create_atoms mol
            if any(self._topo_acc.values()):
                from tpumd.io.read_data import build_special
                for kind, chunks in self._topo_acc.items():
                    if chunks:
                        arr = np.concatenate(chunks)
                        sim.topology[kind] = arr
                        sim.bonded_ntypes[kind] = max(
                            sim.bonded_ntypes.get(kind, 0),
                            int(arr[:, 0].max()))
                if "bond" in sim.topology:
                    sim.special_tags, sim.special_codes = build_special(
                        len(x), sim.topology["bond"])

    def inject_atoms(self, ids, types, x, v=None):
        """lammps_create_atoms (src/library.cpp): append atoms supplied
        by a driver program as flat arrays, after create_box and before
        the first run/setup."""
        if self.box is None:
            raise ScriptError(
                "lammps_create_atoms before create_box/read_data")
        if self.sim is not None and self.sim.state is not None:
            raise ScriptError(
                "lammps_create_atoms after setup is not supported")
        n = len(x)
        self._atoms_x.append(np.asarray(x, np.float64).reshape(n, 3))
        self._atoms_type.append(np.asarray(types, np.int32).reshape(n))
        self._atoms_q.append(None)
        self._atoms_mol.append(None)
        self._atoms_image.append(None)
        self._atoms_v.append(
            None if v is None else np.asarray(v, np.float64).reshape(n, 3))
        self._atoms_tag.append(
            None if ids is None else np.asarray(ids, np.int64).reshape(n))

    def _group_sel_np(self, group: str) -> np.ndarray:
        """Boolean (N,) selector for a named group (host side)."""
        sim = self.sim
        if group == "all":
            return np.ones(sim.natoms, dtype=bool)
        if group not in sim.groups:
            raise ScriptError(f"undefined group {group!r}")
        gm = np.asarray(jax.device_get(sim.state.gmask))
        return (gm & sim.groups[group]) > 0

    def cmd_velocity(self, a):
        self._finalize_atoms()
        sim = self.sim
        group, style = a[0], a[1]
        if style == "set":
            # NULL leaves that component untouched (src/velocity.cpp set);
            # values are in LATTICE units by default (scale_flag=1,
            # src/velocity.cpp:434-445)
            sel = self._group_sel_np(group)
            vnow = np.asarray(jax.device_get(sim.state.v),
                              dtype=np.float64).copy()
            sp = (self.lattice.spacing
                  if self.lattice is not None
                  and "box" not in a[5:] else (1.0, 1.0, 1.0))
            for d, tok in enumerate(a[2:5]):
                if tok != "NULL":
                    vnow[sel, d] = float(tok) * sp[d]
            sim.state = sim.state.replace(
                v=jnp.asarray(vnow, dtype=self.dtype))
            return
        if style == "scale":
            # rescale the GROUP's velocities using the group temperature
            # and group dof (Velocity::scale -> ComputeTemp group semantics)
            t_new = float(a[2])
            sel = self._group_sel_np(group)
            vnow = np.asarray(jax.device_get(sim.state.v),
                              dtype=np.float64).copy()
            masses = sim.mass[np.asarray(jax.device_get(sim.state.type))]
            ngroup = int(sel.sum())
            dof = sim.dimension * ngroup - sim.dimension
            t_cur = sim.units.mvv2e * float(
                (masses[sel, None] * vnow[sel] * vnow[sel]).sum()
            ) / (dof * sim.units.boltz)
            vnow[sel] *= np.sqrt(t_new / t_cur)
            sim.state = sim.state.replace(v=jnp.asarray(vnow, dtype=self.dtype))
            return
        if style == "ramp":
            # velocity group ramp vdim vlo vhi dim clo chi (Velocity::ramp,
            # src/velocity.cpp:612); lattice units default
            sel = self._group_sel_np(group)
            vnow = np.asarray(jax.device_get(sim.state.v),
                              dtype=np.float64).copy()
            x = np.asarray(jax.device_get(sim.state.x), np.float64)
            vdim = "xyz".index(a[2][1])
            cdim = "xyz".index(a[5])
            sp = (self.lattice.spacing if self.lattice is not None
                  else (1.0, 1.0, 1.0))
            v_lo, v_hi = (float(a[3]) * sp[vdim], float(a[4]) * sp[vdim])
            c_lo, c_hi = (float(a[6]) * sp[cdim], float(a[7]) * sp[cdim])
            frac = np.clip((x[:, cdim] - c_lo) / (c_hi - c_lo), 0.0, 1.0)
            vnow[sel, vdim] = (v_lo + frac * (v_hi - v_lo))[sel]
            sim.state = sim.state.replace(
                v=jnp.asarray(vnow, dtype=self.dtype))
            return
        if style == "zero" and a[2] == "linear":
            sel = self._group_sel_np(group)
            vnow = np.asarray(jax.device_get(sim.state.v),
                              dtype=np.float64).copy()
            masses = sim.mass[np.asarray(jax.device_get(sim.state.type))]
            vcm = ((masses[sel, None] * vnow[sel]).sum(0)
                   / masses[sel].sum())
            vnow[sel] -= vcm
            sim.state = sim.state.replace(
                v=jnp.asarray(vnow, dtype=self.dtype))
            return
        if group != "all" or style != "create":
            raise ScriptError("only 'velocity all create/set/scale/zero'"
                              " supported")
        t_desired, seed = float(a[2]), int(a[3])
        opts = a[4:]
        kw = dict(zip(opts[::2], opts[1::2]))
        if kw.get("loop", "all") != "geom":
            raise ScriptError("only 'loop geom' velocity creation supported")
        # fixes already defined remove dof from the temperature used for
        # rescaling (ComputeTemp::dof_compute counts fix_dof) — shake
        # clusters must be identified now to know their count
        fix_dof = 0
        for fx in sim.fixes:
            if getattr(fx, "name", "") in ("shake", "rattle") \
                    and not fx._built:
                n = sim.natoms
                row_of_tag = np.zeros(n + 1, dtype=np.int64)
                row_of_tag[np.asarray(sim.state.tag)] = np.arange(n)
                for b in sim.bonded:
                    if b._incidence is None and b.kind in sim.topology:
                        b.set_topology(n, sim.topology[b.kind], row_of_tag)
                fx.build_clusters(sim, row_of_tag)
            fix_dof += fx.dof_removed
        x = np.asarray(sim.state.x, dtype=np.float64)
        masses = sim.mass[np.asarray(sim.state.type)]
        v = velocity_create_geom(
            x, masses, t_desired, seed,
            boltz=sim.units.boltz, mvv2e=sim.units.mvv2e,
            dist=kw.get("dist", "uniform"),
            zero_momentum=kw.get("mom", "yes") == "yes",
            dimension=sim.dimension,
            extra_dof=sim.dimension + fix_dof,
        )
        sim.state = sim.state.replace(v=jnp.asarray(v, dtype=self.dtype))

    def cmd_pair_style(self, a):
        sim = self._require_sim()
        if sim.ntypes == 0:
            self._pending_pair = (a[0], a[1:])  # before box/data: defer
            sim.pair = None
        else:
            sim.pair = create_pair_style(a[0], sim.ntypes, a[1:],
                                         units=sim.units)

    def _materialize_styles(self):
        sim = self.sim
        if getattr(self, "_pending_pair", None) and sim.pair is None:
            name, args = self._pending_pair
            sim.pair = create_pair_style(name, sim.ntypes, args,
                                         units=sim.units)
            if getattr(self, "_pending_pair_modify", None):
                self._apply_pair_modify(sim.pair, self._pending_pair_modify)
                self._pending_pair_modify = {}
        for kind, spec in list(getattr(self, "_pending_bonded", {}).items()):
            name, args = spec if isinstance(spec, tuple) else (spec, ())
            self._add_bonded(kind, name, args)
        self._pending_bonded = {}

    def cmd_pair_coeff(self, a):
        sim = self.sim

        def parse_range(tok, n):
            if tok == "*":
                return 1, n
            if tok.endswith("*"):
                return int(tok[:-1]), n
            if tok.startswith("*"):
                return 1, int(tok[1:])
            return int(tok), int(tok)

        ilo, ihi = parse_range(a[0], sim.ntypes)
        jlo, jhi = parse_range(a[1], sim.ntypes)
        rest = []
        for tok in a[2:]:
            try:
                rest.append(float(tok))
            except ValueError:
                if not os.path.isabs(tok) and os.path.exists(
                        os.path.join(self.data_dir, tok)):
                    tok = os.path.join(self.data_dir, tok)
                rest.append(tok)
        sim.pair.coeff(ilo, ihi, jlo, jhi, *rest)
        # potentials that carry per-type masses (EAM funcfl/setfl) set them
        # like the reference does (no explicit mass command needed)
        pmass = getattr(sim.pair, "mass", None)
        if pmass is not None:
            nz = np.nonzero(pmass)[0]
            sim.mass[nz] = pmass[nz]

    def cmd_pair_modify(self, a):
        kw = dict(zip(a[::2], a[1::2]))
        sim = self._require_sim()
        if sim.pair is None:   # before box/data: defer to materialize
            self._pending_pair_modify = getattr(
                self, "_pending_pair_modify", {})
            self._pending_pair_modify.update(kw)
            return
        self._apply_pair_modify(sim.pair, kw)

    @staticmethod
    def _apply_pair_modify(pair, kw):
        if "shift" in kw:
            pair.shift = kw["shift"] == "yes"
        if "mix" in kw:
            pair.mix = kw["mix"]
        if "tail" in kw:
            pair.tail_flag = kw["tail"] == "yes" 

    def cmd_neighbor(self, a):
        sim = self._require_sim()
        sim.skin = float(a[0])
        sim.bin_style = a[1]

    def cmd_neigh_modify(self, a):
        sim = self._require_sim()
        i = 0
        while i < len(a):
            key = a[i]
            if key == "delay":
                sim.neigh_delay = int(a[i + 1]); i += 2
            elif key == "every":
                sim.neigh_every = int(a[i + 1]); i += 2
            elif key == "check":
                sim.neigh_check = a[i + 1] == "yes"; i += 2
            elif key == "exclude":
                # exclude group g1 g2 (src/neighbor.cpp exclusion lists)
                if a[i + 1] != "group":
                    raise ScriptError(
                        f"neigh_modify exclude {a[i + 1]} not supported")
                b1 = sim.groups[a[i + 2]]
                b2 = sim.groups[a[i + 3]]
                excl = getattr(sim, "neigh_exclude", ())
                sim.neigh_exclude = excl + ((b1, b2),)
                i += 4
            elif key in ("page", "one", "binsize"):
                i += 2
            else:
                raise ScriptError(f"neigh_modify keyword {key} not supported")

    def cmd_timestep(self, a):
        self.sim.dt = float(a[0])

    def cmd_thermo(self, a):
        self._require_sim().thermo_every = int(a[0])

    def cmd_thermo_style(self, a):
        sim = self._require_sim()
        if a[0] == "one":
            sim.thermo_style = ["step", "temp", "epair", "emol", "etotal", "press"]
        elif a[0] == "custom":
            sim.thermo_style = a[1:]
        elif a[0] == "multi":
            sim.thermo_multi = True
        else:
            raise ScriptError(f"thermo_style {a[0]} not supported")

    def cmd_thermo_modify(self, a):
        kw = dict(zip(a[::2], a[1::2]))
        if "norm" in kw:
            self.sim.thermo_norm = kw["norm"] == "yes"
        if "lost" in kw:
            self.sim.lost_policy = kw["lost"]

    def cmd_fix(self, a):
        sim = self.sim
        fid, group, style = a[0], a[1], a[2]
        args = a[3:]
        if style == "neb":
            # records the band spring + group for the neb command
            # (src/REPLICA/fix_neb.cpp:57; the projection itself runs
            # inside the batched band minimizer, tpumd/md/neb.py)
            self._neb_fix = (group, float(args[0]))
            return
        # same-ID redeclaration replaces the existing fix
        # (Modify::add_fix "replace" semantics, src/modify.cpp)
        existing = [fx for fx in sim.fixes if getattr(fx, "id", None) == fid]
        if existing:
            sim.fixes = [fx for fx in sim.fixes if fx not in existing]
            sim.invalidate_ctx()
        n_before = len(sim.fixes)
        self._dispatch_fix(sim, style, args)
        for fx in sim.fixes[n_before:]:
            fx.id = fid
            if group != "all":
                if group not in sim.groups:
                    raise ScriptError(f"undefined group {group!r}")
                if style in ("shake", "rattle"):
                    raise ScriptError(
                        f"fix {style} on a subgroup not supported yet")
                fx.groupbit = sim.groups[group]
        for fx in sim.fixes[n_before:]:
            if hasattr(fx, "host_setup") and sim.state is not None:
                fx.host_setup(sim)
        if len(sim.fixes) != n_before:
            sim.invalidate_ctx()

    def _dispatch_fix(self, sim, style, args):
        if style == "nve":
            sim.fixes.append(FixNVE())
        elif style == "nve/limit":
            from tpumd.md.fixes import FixNVELimit
            sim.fixes.append(FixNVELimit(float(args[0])))
        elif style == "nve/noforce":
            from tpumd.md.fixes import FixNVENoforce
            sim.fixes.append(FixNVENoforce())
        elif style == "hyper/global":
            from tpumd.md.fix_hyper import FixHyperGlobal
            sim.fixes.append(FixHyperGlobal(
                float(args[0]), float(args[1]), float(args[2]),
                float(args[3]), boltz=sim.units.boltz))
        elif style == "thermal/conductivity":
            from tpumd.md.fix_nemd import FixThermalConductivity
            nswap = 1
            if "swap" in args:
                nswap = int(args[args.index("swap") + 1])
            sim.fixes.append(FixThermalConductivity(
                int(args[0]), args[1], int(args[2]), nswap=nswap))
        elif style == "viscosity":
            from tpumd.md.fix_nemd import FixViscosity
            nswap, vtarget = 1, 1.0e10
            if "swap" in args:
                nswap = int(args[args.index("swap") + 1])
            if "vtarget" in args:
                vt = args[args.index("vtarget") + 1]
                vtarget = 1.0e10 if vt == "INF" else float(vt)
            sim.fixes.append(FixViscosity(
                int(args[0]), args[1], args[2], int(args[3]),
                nswap=nswap, vtarget=vtarget))
        elif style == "heat":
            from tpumd.md.fix_nemd import FixHeat
            sim.fixes.append(FixHeat(int(args[0]), float(args[1])))
        elif style == "oneway":
            from tpumd.md.fix_nemd import FixOneway
            sim.fixes.append(FixOneway(
                int(args[0]), self.regions[args[1]], args[2]))
        elif style == "vector":
            from tpumd.md.fix_nemd import FixVector
            sim.fixes.append(FixVector(int(args[0]), args[1:]))
        elif style == "bond/create":
            from tpumd.md.fix_bond_mc import FixBondCreateMC
            imax = jmax = 0
            rest = list(args[5:])
            i = 0
            while i < len(rest):
                if rest[i] == "iparam":
                    imax = int(rest[i + 1])
                    if int(rest[i + 2]) != int(args[1]):
                        raise ScriptError(
                            "fix bond/create inewtype changes not supported")
                    i += 3
                elif rest[i] == "jparam":
                    jmax = int(rest[i + 1])
                    if int(rest[i + 2]) != int(args[2]):
                        raise ScriptError(
                            "fix bond/create jnewtype changes not supported")
                    i += 3
                elif rest[i] == "prob":
                    raise ScriptError("fix bond/create prob not supported")
                else:
                    raise ScriptError(
                        f"fix bond/create keyword {rest[i]!r} unsupported")
            sim.fixes.append(FixBondCreateMC(
                "all", int(args[0]), int(args[1]), int(args[2]),
                float(args[3]), int(args[4]), imaxbond=imax,
                jmaxbond=jmax))
        elif style == "bond/break":
            from tpumd.md.fix_bond_mc import FixBondBreakMC
            frac = 1.0
            if "prob" in args:
                frac = float(args[args.index("prob") + 1])
            sim.fixes.append(FixBondBreakMC(
                "all", int(args[0]), int(args[1]), float(args[2]),
                fraction=frac))
        elif style == "external":
            from tpumd.md.fix_external import FixExternal
            mode = args[0]
            if mode == "pf/callback":
                fx = FixExternal(mode, ncall=int(args[1]),
                                 napply=int(args[2]))
            else:
                fx = FixExternal(mode, napply=int(args[1]))
            sim.fixes.append(fx)
        elif style == "langevin":
            from tpumd.md.fix_langevin import FixLangevin
            sim.fixes.append(FixLangevin(
                t_start=float(args[0]), t_stop=float(args[1]),
                damp=float(args[2]), seed=int(args[3])))
        elif style in ("nvt", "npt", "nph"):
            sim.fixes.append(self._parse_nh(style, args))
        elif style in ("shake", "rattle"):
            from tpumd.md.fix_shake import FixShake, FixRattle
            cls = FixRattle if style == "rattle" else FixShake
            sim.fixes.append(cls.parse(args))
        elif style in ("rigid", "rigid/nve", "rigid/small",
                       "rigid/nve/small", "rigid/nvt", "rigid/nvt/small",
                       "rigid/npt", "rigid/npt/small",
                       "rigid/nph", "rigid/nph/small"):
            from tpumd.md.fix_rigid import (FixRigid, FixRigidNPH,
                                            FixRigidNPT, FixRigidNVT)
            bstyle = args[0]
            groups = []
            rest = args[1:]
            if bstyle == "group":
                n = int(args[1])
                groups = list(args[2:2 + n])
                rest = args[2 + n:]
            elif bstyle not in ("single", "molecule"):
                raise ScriptError(f"fix rigid style {bstyle!r} unsupported")
            kw = {}
            i = 0
            while i < len(rest):
                if rest[i] == "temp":
                    kw.update(t_start=float(rest[i + 1]),
                              t_stop=float(rest[i + 2]),
                              t_period=float(rest[i + 3]))
                    i += 4
                elif rest[i] == "tparam":
                    kw.update(t_chain=int(rest[i + 1]),
                              t_iter=int(rest[i + 2]),
                              t_order=int(rest[i + 3]))
                    i += 4
                elif rest[i] in ("iso", "aniso"):
                    v = [float(rest[i + 1]), float(rest[i + 2]),
                         float(rest[i + 3])]
                    kw.update(p_start=[v[0]] * 3, p_stop=[v[1]] * 3,
                              p_period=[v[2]] * 3,
                              p_flag=(True, True, True),
                              pstyle=rest[i])
                    i += 4
                elif rest[i] in ("x", "y", "z"):
                    dim = "xyz".index(rest[i])
                    ps = kw.setdefault("p_start", [0.0, 0.0, 0.0])
                    pe = kw.setdefault("p_stop", [0.0, 0.0, 0.0])
                    pp = kw.setdefault("p_period", [1.0, 1.0, 1.0])
                    pf = list(kw.get("p_flag", (False, False, False)))
                    ps[dim] = float(rest[i + 1])
                    pe[dim] = float(rest[i + 2])
                    pp[dim] = float(rest[i + 3])
                    pf[dim] = True
                    kw.update(p_flag=tuple(pf), pstyle="aniso")
                    i += 4
                elif rest[i] == "pchain":
                    kw.update(p_chain=int(rest[i + 1]))
                    i += 2
                elif rest[i] == "dilate":      # "all" only (default)
                    i += 2
                else:
                    raise ScriptError(
                        f"fix rigid keyword {rest[i]!r} unsupported")
            if "/npt" in style:
                sim.fixes.append(FixRigidNPT(style=bstyle, groups=groups,
                                             **kw))
            elif "/nph" in style:
                kw.pop("t_start", None); kw.pop("t_stop", None)
                kw.pop("t_period", None)
                sim.fixes.append(FixRigidNPH(style=bstyle, groups=groups,
                                             **kw))
            elif "/nvt" in style:
                for k in ("p_start", "p_stop", "p_period", "p_flag",
                          "pstyle", "p_chain"):
                    if k in kw:
                        raise ScriptError(
                            "fix rigid/nvt does not take pressure keywords")
                sim.fixes.append(FixRigidNVT(style=bstyle, groups=groups,
                                             **kw))
            else:
                if kw:
                    raise ScriptError(
                        "fix rigid(/nve) does not take temp/tparam")
                sim.fixes.append(FixRigid(style=bstyle, groups=groups))
        elif style == "move":
            sim.fixes.append(self._parse_fix_move(sim, args))
        elif style == "press/berendsen":
            from tpumd.md.fix_misc import FixPressBerendsen
            flags = [False] * 3
            start = [0.0] * 3
            stop = [0.0] * 3
            period = [1.0] * 3
            modulus, couple = 10.0, False
            i = 0
            while i < len(args):
                k = args[i]
                if k in ("iso", "aniso"):
                    for d in range(3):
                        flags[d] = True
                        start[d] = float(args[i + 1])
                        stop[d] = float(args[i + 2])
                        period[d] = float(args[i + 3])
                    couple = couple or (k == "iso")
                    i += 4
                elif k in ("x", "y", "z"):
                    d = "xyz".index(k)
                    flags[d] = True
                    start[d] = float(args[i + 1])
                    stop[d] = float(args[i + 2])
                    period[d] = float(args[i + 3])
                    i += 4
                elif k == "couple":
                    couple = args[i + 1] == "xyz"
                    i += 2
                elif k == "modulus":
                    modulus = float(args[i + 1])
                    i += 2
                elif k == "dilate":
                    if args[i + 1] != "all":
                        raise ScriptError(
                            "fix press/berendsen dilate partial "
                            "not supported")
                    i += 2
                else:
                    raise ScriptError(
                        f"fix press/berendsen keyword {k!r} not supported")
            sim.fixes.append(FixPressBerendsen(
                flags, start, stop, period, modulus=modulus, couple=couple))
        elif style == "setforce":
            from tpumd.md.fix_misc import FixSetForce
            vals = [None if v == "NULL" else float(v) for v in args[:3]]
            sim.fixes.append(FixSetForce(*vals))
        elif style == "addforce":
            from tpumd.md.fix_misc import FixAddForce
            sim.fixes.append(FixAddForce(*[float(v) for v in args[:3]]))
        elif style == "spring/self":
            from tpumd.md.fix_misc import FixSpringSelf
            sim.fixes.append(FixSpringSelf(float(args[0])))
        elif style == "spring":
            from tpumd.md.fix_misc import FixSpring
            if args[0] != "tether":
                raise ScriptError("only 'fix spring tether' supported")
            vals = [None if v == "NULL" else float(v) for v in args[2:5]]
            sim.fixes.append(FixSpring(float(args[1]), *vals,
                                       float(args[5])))
        elif style == "efield":
            from tpumd.md.fix_misc import FixEfield
            qe2f = sim.units.qe2f
            sim.fixes.append(FixEfield(*[qe2f * float(v)
                                         for v in args[:3]]))
        elif style == "drag":
            from tpumd.md.fix_misc import FixDrag
            vals = [None if v == "NULL" else float(v) for v in args[:3]]
            sim.fixes.append(FixDrag(*vals, float(args[3]),
                                     float(args[4])))
        elif style == "recenter":
            from tpumd.md.fix_misc import FixRecenter
            sim.fixes.append(FixRecenter(*args[:3]))
        elif style == "aveforce":
            from tpumd.md.fix_misc import FixAveForce
            vals = [None if v == "NULL" else float(v) for v in args[:3]]
            sim.fixes.append(FixAveForce(*vals))
        elif style == "planeforce":
            from tpumd.md.fix_misc import FixPlaneForce
            sim.fixes.append(FixPlaneForce(*[float(v) for v in args[:3]]))
        elif style == "lineforce":
            from tpumd.md.fix_misc import FixLineForce
            sim.fixes.append(FixLineForce(*[float(v) for v in args[:3]]))
        elif style == "indent":
            from tpumd.md.fix_misc import FixIndent
            if args[1] != "sphere":
                raise ScriptError("only 'fix indent K sphere' supported")
            side = "out"
            scale = (1.0, 1.0, 1.0)
            if "side" in args:
                side = args[args.index("side") + 1]
            # geometry in lattice units by default (fix_indent.cpp:413)
            if ("units" not in args or args[args.index("units") + 1]
                    != "box") and self.lattice is not None:
                scale = self.lattice.spacing
            vals = [float(v) * sc for v, sc in zip(args[2:5], scale)]
            sim.fixes.append(FixIndent(
                float(args[0]), *vals, float(args[5]) * scale[0],
                side=side))
        elif style == "viscous":
            from tpumd.md.fix_misc import FixViscous
            sim.fixes.append(FixViscous(float(args[0])))
        elif style == "momentum":
            from tpumd.md.fix_misc import FixMomentum
            sim.fixes.append(FixMomentum(int(args[0])))
        elif style == "temp/rescale":
            from tpumd.md.fix_misc import FixTempRescale
            sim.fixes.append(FixTempRescale(
                int(args[0]), float(args[1]), float(args[2]),
                float(args[3]), float(args[4])))
        elif style == "temp/berendsen":
            from tpumd.md.fix_misc import FixTempBerendsen
            sim.fixes.append(FixTempBerendsen(
                float(args[0]), float(args[1]), float(args[2])))
        elif style == "nve/sphere":
            from tpumd.md.fix_sphere import FixNVESphere
            sim.fixes.append(FixNVESphere())
        elif style == "freeze":
            from tpumd.md.fix_sphere import FixFreeze
            sim.fixes.append(FixFreeze())
        elif style == "gravity":
            from tpumd.md.fix_sphere import FixGravity
            sim.fixes.append(FixGravity(float(args[0]), args[1], *args[2:]))
        elif style == "wall/gran":
            from tpumd.md.fix_wall_gran import FixWallGran
            sim.fixes.append(FixWallGran(*args))
        elif style == "pour":
            from tpumd.md.fix_pour import FixPour
            pour = FixPour(self, args[0], args[1], args[2], *args[3:])
            sim.fixes.append(pour)
            # nfreq is frozen with the dt AT DEFINITION (the reference
            # computes it in the constructor, before any later
            # `timestep` command changes dt)
            pour.host_setup(sim)
        elif style == "ave/time":
            from tpumd.md.fix_ave import FixAveTime
            kw = {}
            vals = list(args[3:])
            if "file" in vals:
                i = vals.index("file")
                fp = vals[i + 1]
                kw["file"] = fp if os.path.isabs(fp) else \
                    os.path.join(self.data_dir, fp)
                vals = vals[:i] + vals[i + 2:]
            if "mode" in vals:
                i = vals.index("mode")
                kw["mode_vector"] = vals[i + 1] == "vector"
            vals = [v for i, v in enumerate(vals)
                    if v not in ("mode", "scalar", "vector")
                    and (i == 0 or vals[i - 1] != "mode")]
            sim.fixes.append(FixAveTime(args[0], args[1], args[2], vals,
                                        **kw))
        elif style == "ave/atom":
            from tpumd.md.fix_ave import FixAveAtom
            sim.fixes.append(FixAveAtom(args[0], args[1], args[2], args[3:]))
        elif style == "ave/correlate":
            from tpumd.md.fix_ave import FixAveCorrelate
            kw = {}
            vals = list(args[3:])
            for key in ("file", "type", "ave"):
                if key in vals:
                    i = vals.index(key)
                    v = vals[i + 1]
                    if key == "file" and not os.path.isabs(v):
                        v = os.path.join(self.data_dir, v)
                    kw["ctype" if key == "type" else key] = v
                    vals = vals[:i] + vals[i + 2:]
            sim.fixes.append(
                FixAveCorrelate(args[0], args[1], args[2], vals, **kw))
        elif style == "ave/histo":
            from tpumd.md.fix_ave import FixAveHisto
            kw = {}
            vals = list(args[6:])
            for key in ("file", "beyond"):
                if key in vals:
                    i = vals.index(key)
                    kw[key] = vals[i + 1]
                    vals = vals[:i] + vals[i + 2:]
            vals = [v for i, v in enumerate(vals)
                    if v not in ("mode", "scalar", "vector")
                    and (i == 0 or vals[i - 1] != "mode")]
            sim.fixes.append(FixAveHisto(
                args[0], args[1], args[2], args[3], args[4], args[5],
                vals, **kw))
        elif style == "ave/grid":
            from tpumd.md.fix_ave import FixAveGrid
            vals = list(args[6:])
            kw = {}
            if "norm" in vals:
                i = vals.index("norm")
                kw["norm"] = vals[i + 1]
                vals = vals[:i] + vals[i + 2:]
            sim.fixes.append(FixAveGrid(
                args[0], args[1], args[2], args[3], args[4], args[5],
                vals, **kw))
        elif style == "store/state":
            from tpumd.md.fix_ave import FixStoreState
            sim.fixes.append(FixStoreState(args[0], args[1:]))
        elif style == "property/atom":
            from tpumd.md.fix_ave import FixPropertyAtom
            names = [a for a in args if a.startswith(("i_", "d_"))]
            if not names:
                raise ScriptError(
                    "fix property/atom: only i_/d_ custom columns "
                    "supported (mol/q/rmass live in atom styles)")
            sim.fixes.append(FixPropertyAtom(names))
        elif style == "ave/chunk":
            from tpumd.md.fix_ave import FixAveChunk
            kw = {}
            vals = list(args[4:])
            if "file" in vals:
                i = vals.index("file")
                kw["file"] = vals[i + 1]
                vals = vals[:i] + vals[i + 2:]
            cid = args[3]
            if cid.startswith("c_"):
                cid = cid[2:]
            sim.fixes.append(FixAveChunk(args[0], args[1], args[2], cid,
                                         vals, **kw))
        elif style == "print":
            from tpumd.md.fix_ave import FixPrint
            kw = {}
            if "file" in args:
                kw["file"] = args[args.index("file") + 1]
            sim.fixes.append(FixPrint(args[0], args[1], **kw))
        elif style == "halt":
            from tpumd.md.fix_ave import FixHalt
            sim.fixes.append(FixHalt(args[0], args[1], args[2], args[3]))
        elif style == "tune/kspace":
            from tpumd.md.fix_ave import FixTuneKspace
            sim.fixes.append(FixTuneKspace(args[0]))
        elif style == "balance":
            from tpumd.md.fix_ave import FixBalance
            dims = args[3] if len(args) > 3 and args[2] == "shift" else ""
            sim.fixes.append(FixBalance(args[0], args[1], args[2], dims))
        elif style == "deposit":
            from tpumd.md.fix_particle import FixDeposit
            kw = {}
            base = args[:4]
            i = 4
            region = None
            while i < len(args):
                key = args[i]
                if key == "region":
                    region = self.regions[args[i + 1]]; i += 2
                elif key in ("vx", "vy", "vz"):
                    kw[key] = (float(args[i + 1]), float(args[i + 2]))
                    i += 3
                elif key == "near":
                    kw["near"] = float(args[i + 1]); i += 2
                elif key == "attempt":
                    kw["maxattempt"] = int(args[i + 1]); i += 2
                elif key == "mol":
                    kw["mol"] = self.sim.molecules[args[i + 1]]; i += 2
                elif key == "units":
                    i += 2
                else:
                    raise ScriptError(f"deposit keyword {key} unsupported")
            if region is None:
                raise ScriptError("fix deposit requires a region")
            sim.fixes.append(FixDeposit(base[0], base[1], base[2], base[3],
                                        region, **kw))
        elif style == "evaporate":
            from tpumd.md.fix_particle import FixEvaporate
            region = self.regions[args[2]]
            sim.fixes.append(FixEvaporate(args[0], args[1], region, args[3]))
        elif style == "deform":
            from tpumd.md.fix_deform import FixDeform
            nevery = int(args[0])
            specs = {}
            remap = "x"
            i = 1
            while i < len(args):
                key = args[i]
                if key in ("x", "y", "z"):
                    d = "xyz".index(key)
                    st = args[i + 1]
                    nargs = {"final": 2, "delta": 2, "scale": 1, "vel": 1,
                             "erate": 1, "trate": 1}.get(st)
                    if nargs is None:
                        raise ScriptError(f"deform style {st} not supported")
                    specs[d] = (st,) + tuple(
                        float(v) for v in args[i + 2:i + 2 + nargs])
                    i += 2 + nargs
                elif key == "remap":
                    remap = args[i + 1]
                    i += 2
                elif key == "units":
                    i += 2
                else:
                    raise ScriptError(f"deform keyword {key} not supported")
            sim.fixes.append(FixDeform(nevery, specs, remap))
        elif style in ("wall/lj93", "wall/lj126", "wall/harmonic"):
            from tpumd.md.fix_wall import (FixWallHarmonic, FixWallLJ126,
                                           FixWallLJ93)
            cls = {"wall/lj93": FixWallLJ93, "wall/lj126": FixWallLJ126,
                   "wall/harmonic": FixWallHarmonic}[style]
            walls = []
            i = 0
            while i < len(args):
                face = args[i]
                if face not in ("xlo", "xhi", "ylo", "yhi", "zlo", "zhi"):
                    i += 2 if face == "units" else 1
                    continue
                walls.append((face, args[i + 1], float(args[i + 2]),
                              float(args[i + 3]), float(args[i + 4])))
                i += 5
            sim.fixes.append(cls(walls))
        elif style == "wall/reflect":
            from tpumd.md.fix_wall import FixWallReflect
            walls = []
            i = 0
            while i < len(args):
                face = args[i]
                if face in ("xlo", "xhi", "ylo", "yhi", "zlo", "zhi"):
                    walls.append((face, args[i + 1]))
                    i += 2
                else:
                    i += 1
            sim.fixes.append(FixWallReflect(walls))
        elif style == "enforce2d":
            from tpumd.md.fix_misc import FixEnforce2D
            sim.fixes.append(FixEnforce2D())
        elif style == "balance":
            from tpumd.md.fix_misc import FixBalance
            bstyle = "rcb" if "rcb" in args else "shift"
            dims = args[3] if bstyle == "shift" and len(args) > 3 else ""
            sim.fixes.append(FixBalance(args[0], args[1], bstyle, dims))
        else:
            raise ScriptError(f"fix style {style} not supported yet")

    def cmd_unfix(self, a):
        sim = self.sim
        fid = a[0]
        keep = [fx for fx in sim.fixes if getattr(fx, "id", None) != fid]
        if len(keep) == len(sim.fixes):
            raise ScriptError(f"Could not find fix ID {fid!r} to delete")
        sim.fixes = keep
        sim.invalidate_ctx()

    def cmd_group(self, a):
        """group name type/region/id selectors -> gmask bit
        (reference: src/group.cpp, bits in atom->mask)."""
        self._finalize_atoms()
        sim = self.sim
        name, style = a[0], a[1]
        if name in sim.groups:
            bit = sim.groups[name]
        else:
            bit = 1 << len(sim.groups)
            sim.groups[name] = bit
        typ = np.asarray(jax.device_get(sim.state.type))
        tag = np.asarray(jax.device_get(sim.state.tag))
        sel = np.zeros(typ.shape, dtype=bool)
        if style == "type":
            for tok in a[2:]:
                if ":" in tok:
                    lo, hi = tok.split(":")
                    sel |= (typ >= int(lo)) & (typ <= int(hi))
                else:
                    sel |= typ == int(tok)
        elif style == "id":
            for tok in a[2:]:
                if ":" in tok:
                    lo, hi = tok.split(":")[:2]
                    sel |= (tag >= int(lo)) & (tag <= int(hi))
                else:
                    sel |= tag == int(tok)
        elif style == "region":
            reg = self.regions[a[2]]
            x = np.asarray(jax.device_get(sim.state.x), dtype=np.float64)
            sel = reg.inside(x)
        elif style == "subtract":
            gm = np.asarray(jax.device_get(sim.state.gmask))
            sel = (gm & sim.groups[a[2]]) > 0
            for gname in a[3:]:
                sel &= ~((gm & sim.groups[gname]) > 0)
        elif style == "union":
            gm = np.asarray(jax.device_get(sim.state.gmask))
            for gname in a[2:]:
                sel |= (gm & sim.groups[gname]) > 0
        elif style == "intersect":
            gm = np.asarray(jax.device_get(sim.state.gmask))
            sel[:] = True
            for gname in a[2:]:
                sel &= (gm & sim.groups[gname]) > 0
        else:
            raise ScriptError(f"group style {style} not supported")
        gm = np.asarray(jax.device_get(sim.state.gmask)).copy()
        gm[sel] |= bit
        sim.state = sim.state.replace(gmask=jnp.asarray(gm, dtype=jnp.int32))

    def cmd_compute(self, a):
        from tpumd.md.compute_styles import create_compute
        sim = self._require_sim()
        cid, group, style = a[0], a[1], a[2]
        c = create_compute(cid, group, style, a[3:])
        sim.computes[cid] = c
        if sim.state is not None and sim._ctx is not None:
            c.prepare(sim)

    def _parse_fix_move(self, sim, args):
        """fix move linear/wiggle/rotate/transrot/variable
        (src/fix_move.cpp:71-222; default units = lattice)."""
        from tpumd.md.fix_move import FixMove
        mstyle = args[0]
        rest = list(args[1:])
        scaleflag = True
        if len(rest) >= 2 and rest[-2] == "units":
            scaleflag = rest[-1] == "lattice"
            rest = rest[:-2]
        sp = (self.lattice.spacing if self.lattice is not None
              else (1.0, 1.0, 1.0))

        def fnull(tok):
            return None if tok == "NULL" else float(tok)

        if mstyle == "linear":
            vel = [fnull(t) for t in rest[:3]]
            if scaleflag:
                vel = [None if v is None else v * sp[c]
                       for c, v in enumerate(vel)]
            fx = FixMove(FixMove.LINEAR, vel=vel, time_origin=sim.step)
        elif mstyle == "wiggle":
            amp = [fnull(t) for t in rest[:3]]
            if scaleflag:
                amp = [None if a is None else a * sp[c]
                       for c, a in enumerate(amp)]
            fx = FixMove(FixMove.WIGGLE, amp=amp, period=float(rest[3]),
                         time_origin=sim.step)
        elif mstyle == "rotate":
            point = [float(t) for t in rest[:3]]
            axis = [float(t) for t in rest[3:6]]
            if scaleflag:
                point = [p * sp[c] for c, p in enumerate(point)]
            fx = FixMove(FixMove.ROTATE, point=point, axis=axis,
                         period=float(rest[6]), time_origin=sim.step)
        elif mstyle == "transrot":
            vel = [float(t) for t in rest[:3]]
            point = [float(t) for t in rest[3:6]]
            axis = [float(t) for t in rest[6:9]]
            if scaleflag:
                vel = [v * sp[c] for c, v in enumerate(vel)]
                point = [p * sp[c] for c, p in enumerate(point)]
            fx = FixMove(FixMove.TRANSROT, vel=vel, point=point, axis=axis,
                         period=float(rest[9]), time_origin=sim.step)
        elif mstyle == "variable":
            names = [None if t == "NULL" else t.removeprefix("v_")
                     for t in rest[:6]]
            fx = FixMove(FixMove.VARIABLE, varnames=names,
                         time_origin=sim.step)
            fx.script = self
        else:
            raise ScriptError(f"fix move style {mstyle!r} not supported")
        return fx

    def _parse_nh(self, style, args):
        from tpumd.md.fix_nh import FixNH
        kw = {}
        p_flags = [False] * 6
        p_start = [0.0] * 6
        p_stop = [0.0] * 6
        p_period = [0.0] * 6
        i = 0
        tchain, pchain, mtk = 3, 3, True
        iso = False
        while i < len(args):
            key = args[i]
            if key == "temp":
                kw.update(t_start=float(args[i + 1]), t_stop=float(args[i + 2]),
                          t_period=float(args[i + 3]))
                i += 4
            elif key in ("iso", "aniso"):
                for d in range(3):
                    p_flags[d] = True
                    p_start[d] = float(args[i + 1])
                    p_stop[d] = float(args[i + 2])
                    p_period[d] = float(args[i + 3])
                iso = key == "iso"
                i += 4
            elif key in ("x", "y", "z", "yz", "xz", "xy"):
                d = ("x", "y", "z", "yz", "xz", "xy").index(key)
                p_flags[d] = True
                p_start[d] = float(args[i + 1])
                p_stop[d] = float(args[i + 2])
                p_period[d] = float(args[i + 3])
                i += 4
            elif key == "tri":
                # fix_nh.cpp:169-181: aniso diagonal + zero-target tilts
                for d in range(6):
                    p_flags[d] = True
                    p_start[d] = float(args[i + 1]) if d < 3 else 0.0
                    p_stop[d] = float(args[i + 2]) if d < 3 else 0.0
                    p_period[d] = float(args[i + 3])
                i += 4
            elif key == "tchain":
                tchain = int(args[i + 1]); i += 2
            elif key == "pchain":
                pchain = int(args[i + 1]); i += 2
            elif key == "mtk":
                mtk = args[i + 1] == "yes"; i += 2
            elif key == "drag":
                kw["drag"] = float(args[i + 1]); i += 2
            elif key in ("tloop", "ploop", "nreset", "scalexy",
                         "scaleyz", "scalexz", "fixedpoint"):
                i += 2
            else:
                raise ScriptError(f"fix {style} keyword {key} not supported")
        if style in ("npt", "nph") and not any(p_flags):
            raise ScriptError(f"fix {style} requires a barostat keyword")
        return FixNH(p_flags=p_flags if any(p_flags) else None,
                     p_start=p_start, p_stop=p_stop, p_period=p_period,
                     tchain=tchain, pchain=pchain, mtk=mtk,
                     couple_iso=iso, **kw)

    def cmd_run_style(self, a):
        sim = self._require_sim()
        if a[0] == "verlet":
            sim.respa = None
            return
        if a[0] != "respa":
            raise ScriptError(f"run_style {a[0]} not supported")
        nlevels = int(a[1])
        factors = [int(v) for v in a[2:2 + nlevels - 1]]
        loops = tuple(factors) + (1,)
        cats = [set() for _ in range(nlevels)]
        kw = a[2 + nlevels - 1:]
        assigned = set()
        i = 0
        while i < len(kw):
            key, lvl = kw[i], int(kw[i + 1])
            if key in ("bond", "angle", "dihedral", "improper", "pair",
                       "kspace"):
                cats[lvl - 1].add(key)
                assigned.add(key)
            elif key in ("inner", "middle", "outer"):
                raise ScriptError("respa r-space splitting (inner/middle/"
                                  "outer) not supported yet")
            i += 2
        # unassigned categories run at the outermost level (respa.cpp
        # defaults collapse everything unspecified upward)
        for key in ("bond", "angle", "dihedral", "improper", "pair",
                    "kspace"):
            if key not in assigned:
                cats[-1].add(key)
        sim.respa = (loops, tuple(tuple(sorted(c)) for c in cats))

    def cmd_temper(self, a):
        """temper N M temp fix-ID seed1 seed2 (src/REPLICA/temper.cpp):
        spawn one replica per value of the 'world' variable and run
        parallel tempering with configuration swaps."""
        nsteps, nevery = int(a[0]), int(a[1])
        worlds = [(k, v) for k, (st, v) in self.variables.items()
                  if st == "world"]
        if not worlds:
            raise ScriptError("temper requires a world-style variable "
                              "defining the replica temperatures")
        temps = [float(v) for v in worlds[0][1]]
        self._finalize_atoms()
        sims = [self.sim]
        self.sim.verbose = False
        for i in range(1, len(temps)):
            sc = LammpsScript(dtype=self.dtype, data_dir=self.data_dir)
            sc._world_index = i
            for line in self._history[:-1]:
                sc.execute(line)
            sc._finalize_atoms()
            sc.sim.verbose = False
            sims.append(sc.sim)
        from tpumd.md.temper import temper as run_temper
        self.temper_accepts = run_temper(
            sims, temps, nsteps, nevery, int(a[4]), int(a[5]),
            self.sim.units.boltz, log=self.sim._log)
        self.replicas = sims

    def cmd_prd(self, a):
        """prd N t_event n_dephase t_dephase t_correlate compute-ID seed
        [min etol ftol maxiter maxeval] [temp T] [vel loop/dist ...]
        replicas R  (src/REPLICA/prd.cpp command syntax; `replicas R`
        replaces the reference's `-partition` universe: replicas are
        carry snapshots over one compiled step, not MPI partitions)."""
        nsteps, t_event = int(a[0]), int(a[1])
        n_dephase, t_dephase, t_corr = int(a[2]), int(a[3]), int(a[4])
        compute_id, seed = a[5], int(a[6])
        kw = dict(etol=0.1, ftol=0.1, maxiter=40, maxeval=50)
        nreplica = None
        i = 7
        while i < len(a):
            if a[i] == "min":
                kw["etol"], kw["ftol"] = float(a[i + 1]), float(a[i + 2])
                kw["maxiter"], kw["maxeval"] = int(a[i + 3]), int(a[i + 4])
                i += 5
            elif a[i] == "temp":
                kw["temp"] = float(a[i + 1])
                i += 2
            elif a[i] == "vel":
                # vel loop-style dist-style (prd.cpp options); only
                # loop geom is deterministic on device, so the other
                # loop styles map to it
                kw["dist"] = a[i + 2]
                i += 3
            elif a[i] == "time":
                kw["stepmode"] = 0 if a[i + 1] == "steps" else 1
                i += 2
            elif a[i] == "replicas":
                nreplica = int(a[i + 1])
                i += 2
            else:
                raise ScriptError(f"unknown prd keyword {a[i]!r}")
        if nreplica is None:
            raise ScriptError("prd needs 'replicas R' (the reference "
                              "takes replicas from -partition)")
        self._finalize_atoms()
        sim = self.sim
        comp = sim.computes.get(compute_id)
        if comp is None or comp.style != "event/displace":
            raise ScriptError("prd compute-ID must name a compute "
                              "event/displace")
        from tpumd.md.prd import PRD, EventDetector
        det = EventDetector(comp.displace_dist)
        comp.detector = det
        runner = PRD(sim, nreplica, det, seed, log=sim._log, **kw)
        sim._log("Step CPU Clock Event Correlated Coincident Replica")
        self.prd_events = runner.run(nsteps, t_event, n_dephase,
                                     t_dephase, t_corr)

    def cmd_tad(self, a):
        """tad N t_event T_lo T_hi delta_conf tmax compute-ID
        [min etol ftol maxiter maxeval] [neb etol ftol N1 N2 Nevery]
        [neb_style ...] replicas R  (src/REPLICA/tad.cpp; `replicas R`
        sets the NEB band width in place of -partition)."""
        nsteps, t_event = int(a[0]), int(a[1])
        templo, temphi = float(a[2]), float(a[3])
        delta_conf, tmax = float(a[4]), float(a[5])
        compute_id = a[6]
        kw = dict(etol=0.1, ftol=0.1, maxiter=40, maxeval=50,
                  etol_neb=0.01, ftol_neb=0.01, n1_neb=100, n2_neb=100,
                  nevery_neb=10, neb_replicas=4)
        i = 7
        while i < len(a):
            if a[i] == "min":
                kw["etol"], kw["ftol"] = float(a[i + 1]), float(a[i + 2])
                kw["maxiter"], kw["maxeval"] = int(a[i + 3]), int(a[i + 4])
                i += 5
            elif a[i] == "neb":
                kw["etol_neb"], kw["ftol_neb"] = (float(a[i + 1]),
                                                  float(a[i + 2]))
                kw["n1_neb"], kw["n2_neb"] = int(a[i + 3]), int(a[i + 4])
                kw["nevery_neb"] = int(a[i + 5])
                i += 6
            elif a[i] in ("neb_style", "neb_step", "neb_log"):
                i += 2  # quickmin band + NEB dt are fixed in tpumd
            elif a[i] == "replicas":
                kw["neb_replicas"] = int(a[i + 1])
                i += 2
            else:
                raise ScriptError(f"unknown tad keyword {a[i]!r}")
        self._finalize_atoms()
        sim = self.sim
        comp = sim.computes.get(compute_id)
        if comp is None or comp.style != "event/displace":
            raise ScriptError("tad compute-ID must name a compute "
                              "event/displace")
        from tpumd.md.prd import EventDetector
        from tpumd.md.tad import TAD
        det = EventDetector(comp.displace_dist)
        comp.detector = det
        runner = TAD(sim, det, templo, temphi, delta_conf, tmax,
                     log=sim._log, **kw)
        sim._log("Step CPU N M Status Barrier Margin t_lo delt_lo")
        self.tad_events = runner.run(nsteps, t_event)

    def cmd_hyper(self, a):
        """hyper N t_event fix-ID compute-ID [min ...] [rebond N]
        (src/REPLICA/hyper.cpp; fix-ID NULL disables the bias)."""
        nsteps, t_event = int(a[0]), int(a[1])
        fix_id, compute_id = a[2], a[3]
        kw = dict(etol=1e-4, ftol=1e-4, maxiter=40, maxeval=50, rebond=0)
        i = 4
        while i < len(a):
            if a[i] == "min":
                kw["etol"], kw["ftol"] = float(a[i + 1]), float(a[i + 2])
                kw["maxiter"], kw["maxeval"] = int(a[i + 3]), int(a[i + 4])
                i += 5
            elif a[i] == "rebond":
                kw["rebond"] = int(a[i + 1])
                i += 2
            else:
                raise ScriptError(f"unknown hyper keyword {a[i]!r}")
        self._finalize_atoms()
        sim = self.sim
        comp = sim.computes.get(compute_id)
        if comp is None or comp.style != "event/displace":
            raise ScriptError("hyper compute-ID must name a compute "
                              "event/displace")
        fix_hyper = None
        if fix_id != "NULL":
            for fx in sim.fixes:
                if getattr(fx, "id", None) == fix_id:
                    fix_hyper = fx
            if fix_hyper is None or fix_hyper.name != "hyper/global":
                raise ScriptError("hyper fix-ID must name a fix "
                                  "hyper/global")
        from tpumd.md.fix_hyper import hyper as run_hyper
        self.hyper_stats = run_hyper(
            sim, nsteps, t_event, comp.displace_dist,
            fix_hyper=fix_hyper, log=sim._log, **kw)
        sim._log(f"hyper time = {self.hyper_stats['t_hyper']:.6g} "
                 f"boost = {self.hyper_stats['boost']:.6g} "
                 f"events = {self.hyper_stats['nevent']}")

    def cmd_delete_atoms(self, a):
        """delete_atoms region <name> (src/delete_atoms.cpp): remove
        atoms inside a region.  Runs pre-setup on the staged atom
        buffers; tags renumber sequentially at finalize (the reference's
        `compress yes` default for atomic systems)."""
        if a[0] != "region":
            raise ScriptError(f"delete_atoms style {a[0]!r} not supported"
                              " (only 'region')")
        if self.sim is not None and self.sim.state is not None:
            raise ScriptError("delete_atoms after setup not supported")
        if any(self._topo_acc.values()):
            raise ScriptError("delete_atoms with bonded topology would"
                              " break tag references")
        reg = self.regions[a[1]]
        ndel = 0
        bufs = (self._atoms_x, self._atoms_type, self._atoms_q,
                self._atoms_mol, self._atoms_image, self._atoms_v,
                self._atoms_tag)
        for i, xa in enumerate(self._atoms_x):
            keep = ~reg.inside(xa)
            ndel += int((~keep).sum())
            for buf in bufs:
                if buf[i] is not None:
                    buf[i] = buf[i][keep]
        print(f"Deleted {ndel} atoms")

    def cmd_neb(self, a):
        """neb etol ftol N1 N2 Nevery final <file> replicas <R>
        (src/REPLICA/neb.cpp command syntax; `replicas R` replaces the
        reference's -partition count — the band is a lane axis here,
        not MPI partitions).  Requires a prior `fix ID group neb K`."""
        if not hasattr(self, "_neb_fix"):
            raise ScriptError("neb requires a fix neb command")
        etol, ftol = float(a[0]), float(a[1])
        n1, n2, nevery = int(a[2]), int(a[3]), int(a[4])
        style = a[5]
        if style != "final":
            raise ScriptError(f"neb file style {style!r} not supported "
                              "(only 'final')")
        path = a[6] if os.path.isabs(a[6]) \
            else os.path.join(self.data_dir, a[6])
        kw = dict(zip(a[7::2], a[8::2]))
        if "replicas" not in kw:
            raise ScriptError("neb needs 'replicas R' (the reference "
                              "takes the count from -partition)")
        nrep = int(kw["replicas"])
        self._finalize_atoms()
        sim = self.sim
        if sim._ctx is None:
            sim.setup()
        group, kspring = self._neb_fix
        n = sim.natoms
        if group == "all":
            sim.neb_gsel = np.ones((sim.state.x.shape[0],), bool)
        else:
            bit = sim.groups[group]
            sim.neb_gsel = np.asarray(
                jax.device_get((sim.state.gmask & bit) > 0))
        from tpumd.md.neb import neb, read_neb_file
        tags, xyz = read_neb_file(path, n)
        self.neb_result = neb(sim, etol, ftol, n1, n2, nevery, tags, xyz,
                              kspring=kspring, nreplica=nrep,
                              log=sim._log)

    def cmd_run(self, a):
        self._finalize_atoms()
        n = int(a[0])
        if len(a) > 1 and a[1] == "upto":
            n = max(0, n - self.sim.step)
        self.sim.run(n)

    def cmd_minimize(self, a):
        self._finalize_atoms()
        self.sim.minimize(float(a[0]), float(a[1]), int(a[2]), int(a[3]))

    def cmd_min_style(self, a):
        self._require_sim().min_style = a[0]  # fire, cg, sd

    def cmd_min_modify(self, a):
        pass

    def cmd_dump(self, a):
        from tpumd.io.dump import Dump
        sim = self._require_sim()
        did, group, style, every, path = a[0], a[1], a[2], int(a[3]), a[4]
        path = path if os.path.isabs(path) else os.path.join(
            self.data_dir, path)
        if style == "image":
            from tpumd.io.dump_image import DumpImage
            sim.dumps.append(DumpImage(did, group, style, every, path,
                                       args=a[5:]))
            return
        if style == "movie":
            from tpumd.io.dump_image import DumpMovie
            sim.dumps.append(DumpMovie(did, group, style, every, path,
                                       args=a[5:]))
            return
        if style == "local":
            from tpumd.io.dump import DumpLocal
            sim.dumps.append(DumpLocal(did, group, style, every, path,
                                       list(a[5:])))
            return
        if style == "cfg":
            from tpumd.io.dump import DumpCFG
            sim.dumps.append(DumpCFG(did, group, style, every, path,
                                     list(a[5:])))
            return
        if style == "grid":
            from tpumd.io.dump import DumpGrid
            sim.dumps.append(DumpGrid(did, group, style, every, path,
                                      list(a[5:])))
            return
        fields = a[5:] if style == "custom" else None
        sim.dumps.append(Dump(did, group, style, every, path, fields))

    def cmd_dump_modify(self, a):
        sim = self.sim
        d = next(dd for dd in sim.dumps if dd.id == a[0])
        d.modify(a[1:])

    def cmd_undump(self, a):
        sim = self.sim
        sim.dumps = [d for d in sim.dumps if d.id != a[0]]

    def cmd_write_restart(self, a):
        from tpumd.io.restart import write_restart
        path = a[0] if os.path.isabs(a[0]) else os.path.join(
            self.data_dir, a[0])
        if self.sim._ctx is None:
            self._finalize_atoms()
            self.sim.setup()
        write_restart(self.sim, path)

    def cmd_read_restart(self, a):
        from tpumd.io.restart import read_restart
        path = a[0] if os.path.isabs(a[0]) else os.path.join(
            self.data_dir, a[0])
        sim = self._require_sim()
        read_restart(sim, path)
        self._materialize_styles()

    def cmd_write_data(self, a):
        from tpumd.io.restart import write_data
        path = a[0] if os.path.isabs(a[0]) else os.path.join(
            self.data_dir, a[0])
        self._finalize_atoms()
        write_data(self.sim, path)

    def cmd_reset_timestep(self, a):
        self.sim.step = int(a[0])

    def cmd_print(self, a):
        line = " ".join(a).strip('"')
        print(line, flush=True)

    def cmd_echo(self, a):
        pass

    def cmd_info(self, a):
        """info [system|groups|styles|fixes|computes|variables|all ...]
        (src/info.cpp categories; `out screen` only)."""
        cats = [t for t in a if t not in ("out", "screen", "log")] or ["system"]
        if "all" in cats:
            cats = ["system", "groups", "styles", "fixes", "computes",
                    "variables"]
        sim = self.sim
        for cat in cats:
            print(f"Info-Info-Info: {cat}")
            if cat == "system" and sim is not None:
                lo = np.asarray(jax.device_get(sim.state.box.lo)) \
                    if sim.state is not None else None
                print(f"units = {sim.units.name}")
                print(f"atom_style = {self.atom_style}")
                print(f"natoms = {sim.natoms}  ntypes = {sim.ntypes}  "
                      f"step = {sim.step}")
                if sim.state is not None:
                    hi = np.asarray(jax.device_get(sim.state.box.hi))
                    per = "".join("p" if p else "f"
                                  for p in sim.state.box.periodic)
                    print(f"box = ({lo[0]:g} {lo[1]:g} {lo[2]:g}) to "
                          f"({hi[0]:g} {hi[1]:g} {hi[2]:g})  boundary {per}")
                if sim.pair is not None:
                    print(f"pair_style = {sim.pair.name}")
                if sim.kspace is not None:
                    print(f"kspace_style = {type(sim.kspace).__name__}")
            elif cat == "groups" and sim is not None:
                for name, bit in sim.groups.items():
                    print(f"group {name} bit {bit}")
            elif cat == "styles":
                from tpumd.models import registry as reg
                reg._ensure_imports()
                print("pair styles:", " ".join(sorted(reg._PAIR_STYLES)))
                print("bond styles:", " ".join(sorted(reg._BOND_STYLES)))
                print("angle styles:", " ".join(sorted(reg._ANGLE_STYLES)))
            elif cat == "fixes" and sim is not None:
                for fx in sim.fixes:
                    print(f"fix {getattr(fx, 'id', '?')} "
                          f"style {fx.name}")
            elif cat == "computes" and sim is not None:
                for cid, comp in sim.computes.items():
                    print(f"compute {cid} style {comp.style}")
            elif cat == "variables":
                for name, (style, val) in self.variables.items():
                    print(f"variable {name} style {style} = {val}")

    def cmd_balance(self, a):
        """balance thresh rcb | balance thresh shift dimstr N stopthresh
        (src/balance.cpp): equal-atom spatial row blocks for the sharded
        matrix decomposition; the cell-grid engine is balanced by
        construction (equal slots = equal dense compute)."""
        from tpumd.parallel.balance import balance_atoms
        sim = self._require_sim()
        self._finalize_atoms()
        thresh = float(a[0])
        style = a[1]
        if style == "rcb":
            before, after = balance_atoms(sim, "rcb")
        elif style == "shift":
            before, after = balance_atoms(sim, "shift", dims=a[2])
        elif style in ("x", "y", "z"):
            before, after = balance_atoms(sim, "shift", dims=style)
        else:
            raise ScriptError(f"balance style {style!r} not supported")
        print(f"  rebalancing: imbalance {before:.6g} -> {after:.6g} "
              f"(threshold {thresh})", flush=True)

    def cmd_plugin(self, a):
        """plugin load <module.py> | list | clear (src/plugin.cpp).

        A tpumd plugin is a Python file executed with the open style
        registries in scope: module-level code registers new styles via
        @register_pair / @register_bonded / register_fix / register_compute
        — the TPU-native analog of the reference's dlopen'd
        lammpsplugin_init shared objects."""
        sub = a[0]
        if sub == "load":
            import importlib.util
            path = a[1] if os.path.isabs(a[1]) else os.path.join(
                self.data_dir, a[1])
            name = "tpumd_plugin_" + os.path.splitext(
                os.path.basename(path))[0]
            spec = importlib.util.spec_from_file_location(name, path)
            if spec is None:
                raise ScriptError(f"cannot load plugin {path!r}")
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            self._plugins = getattr(self, "_plugins", {})
            self._plugins[name] = mod
            n = len(getattr(mod, "__tpumd_styles__", ())) or "?"
            print(f"Loaded plugin {os.path.basename(path)}: {n} styles")
        elif sub == "list":
            for name in getattr(self, "_plugins", {}):
                print(f"plugin {name}")
        elif sub in ("clear", "unload"):
            pass  # registrations are permanent for the session
        else:
            raise ScriptError(f"plugin subcommand {sub!r} not supported")

    def cmd_timer(self, a):
        """timer full|normal|loop|off [sync|nosync] [timeout HH:MM:SS]
        [every N] (Timer::modify_params, src/timer.cpp:228-281)."""
        sim = self._require_sim()
        i = 0
        while i < len(a):
            tok = a[i]
            if tok == "full":
                sim.timer_full = True
            elif tok in ("normal", "loop", "off"):
                sim.timer_full = False
            elif tok in ("sync", "nosync"):
                sim.timer_sync = tok == "sync"
            elif tok == "timeout":
                val = a[i + 1]
                i += 1
                if val in ("off", "unlimited", "-1"):
                    sim.timer_timeout = None
                else:
                    parts = [float(p) for p in val.split(":")]
                    secs = 0.0
                    for p in parts:
                        secs = secs * 60 + p
                    sim.timer_timeout = secs
            elif tok == "every":
                sim.timer_every = int(a[i + 1])
                i += 1
            else:
                raise ScriptError(f"timer keyword {tok!r} not supported")
            i += 1

    def cmd_log(self, a):
        """log <file>|none [append] (src/lammps.cpp:557): redirect the
        thermo/finish output stream to a new log file mid-script."""
        sim = self._require_sim()
        if sim.log_fh is not None:
            sim.log_fh.close()
            sim.log_fh = None
        if a[0] == "none":
            return
        path = a[0] if os.path.isabs(a[0]) else os.path.join(
            self.data_dir, a[0])
        sim.log_fh = open(path, "a" if "append" in a[1:] else "w")

    def cmd_kspace_style(self, a):
        sim = self._require_sim()
        if a[0] == "pppm":
            from tpumd.models.kspace_pppm import PPPM
            sim.kspace = PPPM(float(a[1]))
        elif a[0] == "pppm/cg":
            from tpumd.models.kspace_pppm import PPPMCG
            sim.kspace = PPPMCG(float(a[1]),
                                *[float(v) for v in a[2:3]])
        elif a[0] == "pppm/stagger":
            from tpumd.models.kspace_pppm import PPPMStagger
            sim.kspace = PPPMStagger(float(a[1]))
        elif a[0] == "pppm/tip4p":
            from tpumd.models.kspace_pppm import PPPMTIP4P
            sim.kspace = PPPMTIP4P(float(a[1]))
        elif a[0] == "pppm/disp":
            from tpumd.models.kspace_pppm_disp import PPPMDisp
            sim.kspace = PPPMDisp(float(a[1]))
        elif a[0] == "msm":
            from tpumd.models.kspace_msm import MSM
            sim.kspace = MSM(float(a[1]))
        elif a[0] == "ewald":
            from tpumd.models.kspace_ewald import Ewald
            sim.kspace = Ewald(float(a[1]))
        elif a[0] == "ewald/disp":
            from tpumd.models.kspace_ewald import EwaldDisp
            sim.kspace = EwaldDisp(float(a[1]))
        elif a[0] == "none":
            sim.kspace = None
        else:
            raise ScriptError(f"kspace_style {a[0]} not supported")

    def cmd_kspace_modify(self, a):
        """kspace_modify keyword value ... (src/kspace.cpp modify_params
        subset): diff ad|ik, mesh nx ny nz, order N, gewald g."""
        sim = self._require_sim()
        ks = sim.kspace
        if ks is None:
            raise ScriptError("kspace_modify before kspace_style")
        i = 0
        while i < len(a):
            key = a[i]
            if key == "diff":
                ks.mode = {"ad": "ad", "ik": "ik"}[a[i + 1]]
                i += 2
            elif key == "mesh":
                ks.mesh_override = (int(a[i + 1]), int(a[i + 2]),
                                    int(a[i + 3]))
                i += 4
            elif key == "order":
                ks.order = int(a[i + 1])
                i += 2
            elif key == "gewald":
                ks.gewald_override = float(a[i + 1])
                i += 2
            elif key == "disp/auto":
                ks.disp_auto = a[i + 1] == "yes"
                i += 2
            elif key == "mesh/disp":
                ks.mesh6_override = (int(a[i + 1]), int(a[i + 2]),
                                     int(a[i + 3]))
                i += 4
            elif key == "order/disp":
                ks.order_6 = int(a[i + 1])
                i += 2
            elif key == "gewald/disp":
                ks.gewald6_override = float(a[i + 1])
                i += 2
            else:
                raise ScriptError(f"kspace_modify {key} not supported")

    def cmd_molecule(self, a):
        """molecule ID file (src/molecule.cpp): register a template for
        fix deposit/pour and create_atoms."""
        from tpumd.io.molecule import MoleculeTemplate
        path = a[1]
        if not os.path.isabs(path):
            path = os.path.join(self.data_dir, path)
        sim = self._require_sim()
        sim.molecules[a[0]] = MoleculeTemplate(a[0], path)

    def cmd_read_data(self, a):
        path = a[0]
        if not os.path.isabs(path):
            path = os.path.join(self.data_dir, path)
        sim = self._require_sim()
        d = read_data(path, self.atom_style)
        sim.ntypes = d.natomtypes
        sim.mass = d.masses.copy()
        periodic = tuple(tok == "p" for tok in sim.boundary)
        if d.tilt is not None and np.any(d.tilt != 0):
            # the reference remaps every atom through lamda space at read
            # time (Domain::remap, src/atom.cpp:1176) — a 1-ulp coordinate
            # round trip that deterministic velocity hashes see; replicate
            # with the exact h_inv arithmetic order (domain.cpp x2lamda)
            d.x, shift = _triclinic_remap_np(
                d.x, d.box_lo, d.box_hi, d.tilt, periodic)
            d.image = d.image + shift
            box = Box.triclinic(d.box_lo, d.box_hi, d.tilt,
                                dtype=self.dtype, periodic=periodic)
        else:
            # the reference remaps every read atom into the box
            # (src/atom.cpp:1176 -> Domain::remap) and folds the shift
            # into the image flags; loop-geom velocity hashes see the
            # remapped coordinates, so this must happen before velocity
            from tpumd.core.create import remap_host
            d.x = np.ascontiguousarray(d.x, dtype=np.float64)
            d.image = d.image + remap_host(
                d.x, np.asarray(d.box_lo, np.float64),
                np.asarray(d.box_hi, np.float64), periodic)
            box = Box.orthogonal(d.box_lo, d.box_hi, dtype=self.dtype,
                                 periodic=periodic)
        sim.state = make_state(d.x, d.v, d.types, box, q=d.q,
                               molecule=d.molecule, radius=d.radius,
                               rmass=d.rmass, omega=d.omega,
                               extras=d.fields, dtype=self.dtype)
        sim.state = sim.state.replace(
            image=jnp.asarray(d.image, dtype=jnp.int32))
        sim.topology = {}
        for kind, arr, ntypes in (
            ("bond", d.bonds, d.nbondtypes),
            ("angle", d.angles, d.nangletypes),
            ("dihedral", d.dihedrals, d.ndihedraltypes),
            ("improper", d.impropers, d.nimpropertypes),
        ):
            sim.bonded_ntypes[kind] = ntypes
            if arr is not None and len(arr):
                sim.topology[kind] = arr
        if d.bonds is not None and len(d.bonds):
            sim.special_tags, sim.special_codes = build_special(
                d.natoms, d.bonds)
        self._materialize_styles()
        # coeff sections embedded in the data file
        if "Pair Coeffs" in d.coeffs and sim.pair is not None:
            if hasattr(sim.pair, "coeff_from_data"):
                sim.pair.coeff_from_data(d.coeffs["Pair Coeffs"])
            else:
                for r in d.coeffs["Pair Coeffs"]:
                    t = int(r[0])
                    sim.pair.coeff(t, t, t, t,
                                   *[float(v) for v in r[1:]])
        for kind, sect in (("bond", "Bond Coeffs"), ("angle", "Angle Coeffs"),
                           ("dihedral", "Dihedral Coeffs"),
                           ("improper", "Improper Coeffs")):
            if sect in d.coeffs:
                style = next((b for b in sim.bonded if b.kind == kind), None)
                if style is not None:
                    for r in d.coeffs[sect]:
                        style.coeff(int(r[0]), *[float(v) for v in r[1:]])
        # class2 cross-term sections route to the style's keyword coeffs
        # (read_data.cpp anglecoeffs/dihedralcoeffs/impropercoeffs pass
        # the sub-keyword as arg[1])
        for kind, sect, kw in (
                ("angle", "BondBond Coeffs", "bb"),
                ("angle", "BondAngle Coeffs", "ba"),
                ("dihedral", "MiddleBondTorsion Coeffs", "mbt"),
                ("dihedral", "EndBondTorsion Coeffs", "ebt"),
                ("dihedral", "AngleTorsion Coeffs", "at"),
                ("dihedral", "AngleAngleTorsion Coeffs", "aat"),
                ("dihedral", "BondBond13 Coeffs", "bb13"),
                ("improper", "AngleAngle Coeffs", "aa")):
            if sect in d.coeffs:
                style = next((b for b in sim.bonded if b.kind == kind), None)
                if style is not None:
                    for r in d.coeffs[sect]:
                        style.coeff(int(r[0]), kw,
                                    *[float(v) for v in r[1:]])
        self._data = d

    def _add_bonded(self, kind, name, args=()):
        sim = self._require_sim()
        style = create_bonded_style(kind, name,
                                    sim.bonded_ntypes.get(kind, 1),
                                    args=args)
        # replace existing style of same kind
        sim.bonded = [b for b in sim.bonded if b.kind != kind] + [style]
        return style

    def _bonded_style_cmd(self, kind, name, args=()):
        if name == "none":
            return
        sim = self._require_sim()
        if kind not in sim.bonded_ntypes:   # before read_data: defer
            if not hasattr(self, "_pending_bonded"):
                self._pending_bonded = {}
            self._pending_bonded[kind] = (name, tuple(args))
        else:
            self._add_bonded(kind, name, args)

    def cmd_bond_style(self, a):
        self._bonded_style_cmd("bond", a[0], a[1:])

    def cmd_angle_style(self, a):
        self._bonded_style_cmd("angle", a[0], a[1:])

    def cmd_dihedral_style(self, a):
        self._bonded_style_cmd("dihedral", a[0], a[1:])

    def cmd_improper_style(self, a):
        self._bonded_style_cmd("improper", a[0], a[1:])

    def _bonded_coeff(self, kind, a):
        sim = self.sim
        style = next(b for b in sim.bonded if b.kind == kind)

        def conv(v):
            try:
                return float(v)
            except ValueError:
                # hybrid sub-style name, coeff keyword, or a table file:
                # resolve table files against the deck's data_dir
                p = os.path.join(self.data_dir, v)
                if not os.path.exists(v) and os.path.exists(p):
                    return p
                return v

        style.coeff(int(a[0]), *[conv(v) for v in a[1:]])

    def cmd_bond_coeff(self, a):
        self._bonded_coeff("bond", a)

    def cmd_angle_coeff(self, a):
        self._bonded_coeff("angle", a)

    def cmd_dihedral_coeff(self, a):
        self._bonded_coeff("dihedral", a)

    def cmd_improper_coeff(self, a):
        self._bonded_coeff("improper", a)

    def cmd_displace_atoms(self, a):
        """displace_atoms group move/random (src/displace_atoms.cpp);
        random style uses the coordinate-hash RanPark reset, so results
        are bit-exact with the reference."""
        self._finalize_atoms()
        sim = self.sim
        sel = self._group_sel_np(a[0])
        style = a[1]
        scale = (self.lattice.spacing if self.lattice is not None
                 and "units" not in a else np.ones(3))
        if "units" in a and a[a.index("units") + 1] == "lattice" \
                and self.lattice is not None:
            scale = self.lattice.spacing
        x = np.array(jax.device_get(sim.state.x), dtype=np.float64)
        if style == "move":
            d = np.array([float(v) for v in a[2:5]]) * scale
            x[sel] += d
        elif style == "random":
            # RanPark::reset(seed, coord) hash + 5 warmups + 3 draws —
            # the same vectorized machinery as velocity loop geom
            from tpumd.utils.ranpark import geom_uniform_triplets
            d = np.array([float(a[2]) * scale[0], float(a[3]) * scale[1],
                          float(a[4]) * scale[2]])
            u = geom_uniform_triplets(int(a[5]), x)
            x[sel] += d[None, :] * 2.0 * (u[sel] - 0.5)
        else:
            raise ScriptError(f"displace_atoms style {style} not supported")
        sim.state = sim.state.replace(x=jnp.asarray(x, dtype=self.dtype))
        sim.invalidate_ctx()

    def cmd_replicate(self, a):
        """Tile the system nx x ny x nz (src/replicate.cpp): atoms shifted
        by box images, topology retagged per replica."""
        nx, ny, nz = int(a[0]), int(a[1]), int(a[2])
        if (nx, ny, nz) == (1, 1, 1):
            return
        self._finalize_atoms()
        sim = self.sim
        s = sim.state
        n = sim.natoms
        x = np.asarray(jax.device_get(s.x), dtype=np.float64)
        v = np.asarray(jax.device_get(s.v), dtype=np.float64)
        typ = np.asarray(jax.device_get(s.type))
        lo = np.asarray(jax.device_get(s.box.lo), dtype=np.float64)
        hi = np.asarray(jax.device_get(s.box.hi), dtype=np.float64)
        q = None if s.q is None else np.asarray(jax.device_get(s.q))
        mol = None if s.molecule is None else np.asarray(
            jax.device_get(s.molecule))
        ell = hi - lo
        # unwrap molecules across the old periodic boundaries first
        # (reference: src/replicate.cpp works on image-unwrapped coords) —
        # setup's wrap_pbc re-wraps into the enlarged box afterwards
        image = np.asarray(jax.device_get(s.image))
        x = x + image * ell
        reps = [(i, j, k) for k in range(nz) for j in range(ny)
                for i in range(nx)]
        nrep = len(reps)
        shifts = np.array(reps, dtype=np.float64) * ell
        xs = np.concatenate([x + sh for sh in shifts])
        vs = np.tile(v, (nrep, 1))
        types = np.tile(typ, nrep)
        qs = None if q is None else np.tile(q, nrep)
        maxmol = int(mol.max()) if mol is not None and len(mol) else 0
        mols = (None if mol is None else np.concatenate(
            [mol + r * maxmol for r in range(nrep)]))
        from tpumd.core.state import Box, make_state
        box = Box.orthogonal(lo, lo + ell * np.array([nx, ny, nz]),
                             dtype=self.dtype)
        sim.state = make_state(xs, vs, types, box, q=qs, molecule=mols,
                               dtype=self.dtype)
        sim._natoms = None
        new_topo = {}
        for kind, arr in sim.topology.items():
            out = []
            for r in range(nrep):
                rep = arr.copy()
                rep[:, 1:] += r * n
                out.append(rep)
            new_topo[kind] = np.concatenate(out)
        sim.topology = new_topo
        if sim.special_tags is not None:
            st, sc = sim.special_tags, sim.special_codes
            offs = (np.arange(nrep)[:, None, None] * n).astype(st.dtype)
            tiled = np.concatenate(
                [np.where(st > 0, st + o, 0) for o in offs])
            sim.special_tags = tiled
            sim.special_codes = np.tile(sc, (nrep, 1))

    def cmd_atom_modify(self, a):
        pass  # map/sort settings handled internally

    def cmd_special_bonds(self, a):
        sim = self._require_sim()
        if a[0] == "fene":
            sim.special_lj = np.array([1.0, 0.0, 1.0, 1.0])
            sim.special_coul = np.array([1.0, 0.0, 1.0, 1.0])
        elif a[0] == "charmm":
            sim.special_lj = np.array([1.0, 0.0, 0.0, 0.0])
            sim.special_coul = np.array([1.0, 0.0, 0.0, 0.0])
        elif a[0] == "amber":
            sim.special_lj = np.array([1.0, 0.0, 0.0, 0.5])
            sim.special_coul = np.array([1.0, 0.0, 0.0, 1.0 / 1.2])
        elif a[0] == "lj/coul":
            w = [float(v) for v in a[1:4]]
            sim.special_lj = np.array([1.0] + w)
            sim.special_coul = np.array([1.0] + w)
        else:
            raise ScriptError(f"special_bonds {a[0]} not supported")


def _triclinic_remap_np(x, lo, hi, tilt, periodic):
    """Domain::remap for all atoms (host, numpy): x -> lamda (reference
    h_inv order), wrap into [0,1), -> x (reference h order)."""
    x = np.asarray(x, np.float64)
    lo = np.asarray(lo, np.float64)
    ell = np.asarray(hi, np.float64) - lo
    xy, xz, yz = (float(t) for t in tilt)
    lx, ly, lz = ell
    hinv = [1.0 / lx, 1.0 / ly, 1.0 / lz,
            -yz / (ly * lz), (yz * xy - ly * xz) / (lx * ly * lz),
            -xy / (lx * ly)]
    dd = x - lo
    lam = np.stack([hinv[0] * dd[:, 0] + hinv[5] * dd[:, 1]
                    + hinv[4] * dd[:, 2],
                    hinv[1] * dd[:, 1] + hinv[3] * dd[:, 2],
                    hinv[2] * dd[:, 2]], axis=1)
    shift = np.zeros(lam.shape, np.int32)
    for c in range(3):
        if periodic[c]:
            shift[:, c] = np.floor(lam[:, c]).astype(np.int32)
            lam[:, c] -= shift[:, c]
            lam[:, c] = np.maximum(lam[:, c], 0.0)
    out = np.stack([lx * lam[:, 0] + xy * lam[:, 1] + xz * lam[:, 2] + lo[0],
                    ly * lam[:, 1] + yz * lam[:, 2] + lo[1],
                    lz * lam[:, 2] + lo[2]], axis=1)
    return out, shift
