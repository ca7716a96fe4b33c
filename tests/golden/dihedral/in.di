units real
atom_style full
bond_style harmonic
angle_style harmonic
dihedral_style charmm
improper_style harmonic
special_bonds charmm
pair_style lj/charmm/coul/charmm 7.0 8.0
read_data data.di
bond_coeff 1 300.0 1.54
angle_coeff 1 60.0 110.0
dihedral_coeff 1 1.5 3 0 0.5
improper_coeff 1 8.0 0.0
pair_coeff 1 1 0.1 3.2
neighbor 2.0 bin
velocity all create 300.0 9817 loop geom
fix 1 all nve
timestep 0.5
thermo 5
run 10
