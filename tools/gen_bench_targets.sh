#!/bin/sh
# Regenerate the step-100 sanity targets in tools/bench_all.py that the
# reference snapshot's shipped logs do not cover, using the locally
# built reference binary (cmake build of /root/reference -> LMP).
# Shipped-log targets (lj/chain/eam/chute) come straight from
# /root/reference/bench/log.6Oct16.*.fixed.icc.1 and never change.
set -e
LMP=${LMP:-/tmp/lmpbuild/lmp}
REPO=$(dirname "$(dirname "$(readlink -f "$0")")")

# rhodo_class stand-in (synthetic water box, CHARMM+PPPM+SHAKE+NPT)
cat > /tmp/in.rhodo_class <<EOF
units           real
atom_style      full
bond_style      harmonic
angle_style     charmm
pair_style      lj/charmm/coul/long 6.0 7.0
kspace_style    pppm 1e-4
special_bonds   charmm
read_data       $REPO/tests/golden/water_npt/data.water
replicate       4 4 4
bond_coeff      1 450.0 0.9572
angle_coeff     1 55.0 104.52 0.0 0.0
pair_coeff      1 1 0.1521 3.1507
pair_coeff      2 2 0.0460 0.4000
neighbor        2.0 bin
neigh_modify    every 1 delay 5 check yes
fix             0 all shake 0.0001 20 0 b 1 a 1
fix             1 all npt temp 300.0 300.0 100.0 iso 0.0 0.0 1000.0
velocity        all create 300.0 48291 loop geom
timestep        1.0
thermo          100
thermo_style    custom step temp epair etotal press vol
run             600
EOF
"$LMP" -in /tmp/in.rhodo_class -log /tmp/log.rhodo_class

# 864k LJ melt (bench/in.lj scaled 20 -> 60 cells per side)
sed -e 's/0 20/0 60/g' -e 's/^run.*/run 100/' \
    /root/reference/bench/in.lj > /tmp/in.lj864
"$LMP" -in /tmp/in.lj864 -log /tmp/log.lj864

grep -A2 "Step          Temp" /tmp/log.rhodo_class | head -3
grep -A2 "Step          Temp" /tmp/log.lj864 | head -3
