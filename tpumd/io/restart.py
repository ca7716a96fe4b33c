"""Checkpoint / restart: binary snapshots of the full simulation state.

The reference writes versioned binary restart files containing box,
style coeffs and per-atom state (src/write_restart.cpp:222-394).  Here a
checkpoint is an ``.npz`` of the state pytree plus fix/RNG state and a
JSON header of the style configuration — exact continuation of the
trajectory (same positions/velocities/forces, NH chain variables, host
RNG stream positions).
"""

from __future__ import annotations

import json

import jax
import numpy as np

FORMAT_VERSION = 1
MAGIC = "tpumd-restart"


def write_restart(sim, path: str):
    s, neigh, fstates, istep = sim._carry
    payload = {
        "x": np.asarray(jax.device_get(s.x)),
        "v": np.asarray(jax.device_get(s.v)),
        "f": np.asarray(jax.device_get(s.f)),
        "type": np.asarray(jax.device_get(s.type)),
        "tag": np.asarray(jax.device_get(s.tag)),
        "image": np.asarray(jax.device_get(s.image)),
        "box_lo": np.asarray(jax.device_get(s.box.lo)),
        "box_hi": np.asarray(jax.device_get(s.box.hi)),
        "nlocal": np.asarray(jax.device_get(s.nlocal)),
        "mass": np.asarray(sim.mass),
    }
    if s.q is not None:
        payload["q"] = np.asarray(jax.device_get(s.q))
    if s.molecule is not None:
        payload["molecule"] = np.asarray(jax.device_get(s.molecule))
    for k, a in s.extras.items():   # AtomVec registry fields
        if k.startswith("_"):       # derived tables (rebuilt at setup)
            continue
        payload[f"extra_{k}"] = np.asarray(jax.device_get(a))
    # fix states (NH chains etc.) flattened
    for i, fst in enumerate(fstates):
        for j, leaf in enumerate(jax.tree.leaves(fst)):
            payload[f"fix{i}_{j}"] = np.asarray(jax.device_get(leaf))
    # host RNG stream state (langevin RanMars)
    rng_states = []
    for fx in sim.fixes:
        st = getattr(fx, "_stream", None)
        if st is not None:
            rng_states.append({
                "u": st.u.tolist(), "c": st.c, "i97": st.i97, "j97": st.j97,
            })
        else:
            rng_states.append(None)
    header = {
        "magic": MAGIC, "version": FORMAT_VERSION,
        "step": sim.step, "units": sim.units.name, "dt": sim.dt,
        "natoms": sim.natoms, "ntypes": sim.ntypes,
        "rng": rng_states,
    }
    payload["header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)


def read_restart(sim, path: str):
    """Restore per-atom state into an existing Simulation skeleton
    (styles/fixes must be re-declared by the input script, as with the
    reference's read_restart+input pairing)."""
    import jax.numpy as jnp
    from tpumd.core.state import Box, make_state

    data = np.load(path)
    header = json.loads(bytes(data["header"]).decode())
    if header["magic"] != MAGIC:
        raise ValueError("not a tpumd restart file")
    box = Box.orthogonal(data["box_lo"], data["box_hi"], dtype=sim.dtype)
    n = int(data["nlocal"])
    sim.mass = data["mass"]
    sim.ntypes = header["ntypes"]
    sim.state = make_state(
        data["x"][:n], data["v"][:n], data["type"][:n], box,
        tags=data["tag"][:n],
        q=data["q"][:n] if "q" in data else None,
        molecule=data["molecule"][:n] if "molecule" in data else None,
        extras={k[6:]: data[k][:n] for k in data.files
                if k.startswith("extra_")},
        dtype=sim.dtype)
    sim.state = sim.state.replace(
        f=jnp.asarray(data["f"][:n], dtype=sim.dtype),
        image=jnp.asarray(data["image"][:n], dtype=jnp.int32))
    sim.step = header["step"]
    sim.dt = header["dt"]
    # restore host RNG streams
    for fx, rng in zip(sim.fixes, header["rng"]):
        st = getattr(fx, "_stream", None)
        if st is not None and rng is not None:
            st.u = np.asarray(rng["u"])
            st.c = rng["c"]
            st.i97 = rng["i97"]
            st.j97 = rng["j97"]
    return header


def write_data(sim, path: str):
    """Text data file (subset of src/write_data.cpp): header, masses,
    atoms, velocities, topology."""
    s = sim.state
    x = np.asarray(jax.device_get(s.x))
    v = np.asarray(jax.device_get(s.v))
    tag = np.asarray(jax.device_get(s.tag))
    typ = np.asarray(jax.device_get(s.type))
    lo = np.asarray(jax.device_get(s.box.lo))
    hi = np.asarray(jax.device_get(s.box.hi))
    q = None if s.q is None else np.asarray(jax.device_get(s.q))
    mol = None if s.molecule is None else np.asarray(
        jax.device_get(s.molecule))
    valid = tag > 0
    order = np.nonzero(valid)[0][np.argsort(tag[valid])]
    topo = sim.topology or {}
    with open(path, "w") as f:
        f.write(f"LAMMPS data file via tpu-md, timestep = {sim.step}\n\n")
        f.write(f"{len(order)} atoms\n")
        for kind, hdr in (("bond", "bonds"), ("angle", "angles"),
                          ("dihedral", "dihedrals"), ("improper", "impropers")):
            if kind in topo:
                f.write(f"{len(topo[kind])} {hdr}\n")
        f.write(f"\n{sim.ntypes} atom types\n")
        for kind, hdr in (("bond", "bond"), ("angle", "angle"),
                          ("dihedral", "dihedral"), ("improper", "improper")):
            nt = sim.bonded_ntypes.get(kind)
            if nt:
                f.write(f"{nt} {hdr} types\n")
        f.write(f"\n{lo[0]:.16g} {hi[0]:.16g} xlo xhi\n")
        f.write(f"{lo[1]:.16g} {hi[1]:.16g} ylo yhi\n")
        f.write(f"{lo[2]:.16g} {hi[2]:.16g} zlo zhi\n")
        f.write("\nMasses\n\n")
        for t in range(1, sim.ntypes + 1):
            f.write(f"{t} {sim.mass[t]:.16g}\n")
        f.write("\nAtoms\n\n")
        for i in order:
            parts = [str(tag[i])]
            if mol is not None:
                parts.append(str(mol[i]))
            parts.append(str(typ[i]))
            if q is not None:
                parts.append(f"{q[i]:.16g}")
            parts += [f"{x[i, d]:.16g}" for d in range(3)]
            f.write(" ".join(parts) + "\n")
        f.write("\nVelocities\n\n")
        for i in order:
            f.write(f"{tag[i]} " + " ".join(
                f"{v[i, d]:.16g}" for d in range(3)) + "\n")
        for kind, hdr in (("bond", "Bonds"), ("angle", "Angles"),
                          ("dihedral", "Dihedrals"), ("improper", "Impropers")):
            if kind in topo:
                f.write(f"\n{hdr}\n\n")
                for j, row in enumerate(topo[kind]):
                    f.write(f"{j + 1} " + " ".join(str(int(t)) for t in row)
                            + "\n")
