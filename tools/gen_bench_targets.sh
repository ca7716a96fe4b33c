#!/bin/sh
# Regenerate the step-100 sanity targets in tools/bench_all.py that the
# reference snapshot's shipped logs do not cover, using the locally
# built reference binary (cmake build of /root/reference -> LMP).
# Shipped-log targets (lj/chain/eam/chute) come straight from
# /root/reference/bench/log.6Oct16.*.fixed.icc.1 and never change.
set -e
LMP=${LMP:-/tmp/lmpbuild/lmp}
REPO=$(dirname "$(dirname "$(readlink -f "$0")")")

# rhodo_class stand-in: solvated-peptide example data replicated to
# rhodo scale (32,064 atoms) under rhodo's exact force stack
cat > /tmp/in.rhodo2 <<EOF
units           real
neigh_modify    delay 5 every 1
atom_style      full
bond_style      harmonic
angle_style     charmm
dihedral_style  charmm
improper_style  harmonic
pair_style      lj/charmm/coul/long 8.0 10.0
pair_modify     mix arithmetic
kspace_style    pppm 1e-4
read_data       $REPO/tests/golden/peptide/data.peptide
replicate       2 2 4
fix             1 all shake 0.0001 5 0 m 1.0 a 31
fix             2 all npt temp 300.0 300.0 100.0 z 0.0 0.0 1000.0 mtk no pchain 0 tchain 1
special_bonds   charmm
thermo          50
thermo_style    custom step temp epair emol etotal press vol
timestep        2.0
run             200
EOF
"$LMP" -in /tmp/in.rhodo2 -log /tmp/log.rhodo2

# 864k LJ melt (bench/in.lj scaled 20 -> 60 cells per side)
sed -e 's/0 20/0 60/g' -e 's/^run.*/run 100/' \
    /root/reference/bench/in.lj > /tmp/in.lj864
"$LMP" -in /tmp/in.lj864 -log /tmp/log.lj864

grep -A2 "Step          Temp" /tmp/log.rhodo_class | head -3
grep -A2 "Step          Temp" /tmp/log.lj864 | head -3
