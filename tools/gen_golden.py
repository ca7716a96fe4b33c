#!/usr/bin/env python
"""Generate golden test fixtures by running the reference LAMMPS binary.

Usage: python tools/gen_golden.py <lmp_binary> <outdir>

Creates small systems (water box with SHAKE+PPPM+NPT, a chain with CHARMM
dihedrals/impropers), runs the reference binary, and stores the input
deck, data file, per-atom force dump and thermo table as fixtures under
tests/golden/.  The fixtures are committed so CI needs no binary.
"""

import os
import re
import subprocess
import sys

import numpy as np


def write_water_box(path, nside=5, spacing=3.8):
    """A box of rigid-ish TIP3P-like waters on a jittered lattice."""
    rng = np.random.RandomState(11)
    r_oh = 0.9572
    theta = 104.52 * np.pi / 180.0
    waters = []
    for i in range(nside):
        for j in range(nside):
            for k in range(nside):
                o = (np.array([i, j, k]) + 0.5) * spacing \
                    + rng.uniform(-0.15, 0.15, 3)
                # random orientation
                a = rng.normal(size=3); a /= np.linalg.norm(a)
                b = rng.normal(size=3); b -= a * (a @ b)
                b /= np.linalg.norm(b)
                h1 = o + r_oh * a
                h2 = o + r_oh * (np.cos(theta) * a + np.sin(theta) * b)
                waters.append((o, h1, h2))
    L = nside * spacing
    n = len(waters) * 3
    with open(path, "w") as f:
        f.write("water box\n\n")
        f.write(f"{n} atoms\n{len(waters)*2} bonds\n{len(waters)} angles\n\n")
        f.write("2 atom types\n1 bond types\n1 angle types\n\n")
        f.write(f"0.0 {L} xlo xhi\n0.0 {L} ylo yhi\n0.0 {L} zlo zhi\n\n")
        f.write("Masses\n\n1 15.9994\n2 1.008\n\n")
        f.write("Atoms\n\n")
        aid = 0
        for w, (o, h1, h2) in enumerate(waters):
            mol = w + 1
            for pos, typ, q in ((o, 1, -0.834), (h1, 2, 0.417),
                                (h2, 2, 0.417)):
                aid += 1
                f.write(f"{aid} {mol} {typ} {q:.4f} "
                        f"{pos[0]:.8f} {pos[1]:.8f} {pos[2]:.8f}\n")
        f.write("\nBonds\n\n")
        bid = 0
        for w in range(len(waters)):
            o = 3 * w + 1
            for h in (o + 1, o + 2):
                bid += 1
                f.write(f"{bid} 1 {o} {h}\n")
        f.write("\nAngles\n\n")
        for w in range(len(waters)):
            o = 3 * w + 1
            f.write(f"{w+1} 1 {o+1} {o} {o+2}\n")


WATER_DECK = """
units           real
atom_style      full
bond_style      harmonic
angle_style     charmm
pair_style      lj/charmm/coul/long 6.0 7.0
kspace_style    pppm 1e-4
special_bonds   charmm

read_data       data.water

bond_coeff      1 450.0 0.9572
angle_coeff     1 55.0 104.52 0.0 0.0
pair_coeff      1 1 0.1521 3.1507
pair_coeff      2 2 0.0460 0.4000

neighbor        2.0 bin
neigh_modify    every 1 delay 0 check yes

{fixes}
velocity        all create 300.0 48291 loop geom

timestep        1.0
thermo          5
thermo_style    custom step temp epair emol etotal press vol
dump            1 all custom {nrun} dump.water id fx fy fz
dump_modify     1 format float %.12e sort id first no
run             {nrun}
"""

FIX_SETS = {
    "water_nve": "fix             1 all nve\n",
    "water_shake": ("fix             0 all shake 0.0001 20 0 b 1 a 1\n"
                    "fix             1 all nve\n"),
    "water_npt": ("fix             0 all shake 0.0001 20 0 b 1 a 1\n"
                  "fix             1 all npt temp 300.0 300.0 100.0 "
                  "iso 0.0 0.0 1000.0 mtk no pchain 0 tchain 1\n"),
}


def run_case(lmp, outdir, name, deck_text):
    d = os.path.join(outdir, name)
    os.makedirs(d, exist_ok=True)
    write_water_box(os.path.join(d, "data.water"))
    with open(os.path.join(d, "in.test"), "w") as f:
        f.write(deck_text)
    subprocess.run([lmp, "-in", "in.test", "-log", "log.test"],
                   cwd=d, check=True, capture_output=True)
    # extract thermo table into a simple csv
    rows = []
    with open(os.path.join(d, "log.test")) as f:
        in_table = False
        for line in f:
            if re.match(r"\s*Step\s+", line):
                in_table = True
                continue
            if in_table:
                if re.match(r"\s*-?\d", line):
                    rows.append([float(v) for v in line.split()])
                else:
                    in_table = False
    np.savetxt(os.path.join(d, "thermo.csv"), np.asarray(rows))
    print(f"{name}: {len(rows)} thermo rows")


def main():
    lmp, outdir = sys.argv[1], sys.argv[2]
    for name, fixes in FIX_SETS.items():
        run_case(lmp, outdir, name,
                 WATER_DECK.format(fixes=fixes, nrun=10))


if __name__ == "__main__":
    main()
