units           metal
atom_style      atomic
lattice         fcc 3.52
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
pair_style      meam
pair_coeff      * * library.meam Ni Ni.meam Ni
velocity        all create 1400.0 376847 loop geom
neighbor        1.0 bin
neigh_modify    every 1 delay 5 check yes
fix             1 all nve
timestep        0.002
thermo          10
run             20
