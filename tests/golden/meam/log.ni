LAMMPS (2 Aug 2023 - Development)
units           metal
atom_style      atomic
lattice         fcc 3.52
Lattice spacing in x,y,z = 3.52 3.52 3.52
region          box block 0 4 0 4 0 4
create_box      1 box
Created orthogonal box = (0 0 0) to (14.08 14.08 14.08)
  1 by 1 by 1 MPI processor grid
create_atoms    1 box
Created 256 atoms
  using lattice units in orthogonal box = (0 0 0) to (14.08 14.08 14.08)
  create_atoms CPU = 0.000 seconds
pair_style      meam
pair_coeff      * * library.meam Ni Ni.meam Ni
Reading MEAM library file library.meam with DATE: 2012-06-29
Reading MEAM potential file Ni.meam with DATE: 2007-06-11
velocity        all create 1400.0 376847 loop geom
neighbor        1.0 bin
neigh_modify    every 1 delay 5 check yes
fix             1 all nve
timestep        0.002
thermo          10
run             20
Neighbor list info ...
  update: every = 1 steps, delay = 5 steps, check = yes
  max neighbors/atom: 2000, page size: 100000
  master list distance cutoff = 5
  ghost atom cutoff = 5
  binsize = 2.5, bins = 6 6 6
  2 neighbor lists, perpetual/occasional/extra = 2 0 0
  (1) pair meam, perpetual
      attributes: full, newton on
      pair build: full/bin/atomonly
      stencil: full/bin/3d
      bin: standard
  (2) pair meam, perpetual, half/full from (1)
      attributes: half, newton on
      pair build: halffull/newton
      stencil: none
      bin: none
Per MPI rank memory allocation (min/avg/max) = 8.94 | 8.94 | 8.94 Mbytes
   Step          Temp          E_pair         E_mol          TotEng         Press     
         0   1400          -1139.2         0             -1093.0541      17658.088    
        10   596.45254     -1112.6827      0             -1093.0228      31929.768    
        20   630.48749     -1113.8207      0             -1093.039       28492.191    
Loop time of 0.0659148 on 1 procs for 20 steps with 256 atoms

Performance: 52.431 ns/day, 0.458 hours/ns, 303.422 timesteps/s, 77.676 katom-step/s
86.0% CPU use with 1 MPI tasks x no OpenMP threads

MPI task timing breakdown:
Section |  min time  |  avg time  |  max time  |%varavg| %total
---------------------------------------------------------------
Pair    | 0.065528   | 0.065528   | 0.065528   |   0.0 | 99.41
Neigh   | 0          | 0          | 0          |   0.0 |  0.00
Comm    | 0.00013136 | 0.00013136 | 0.00013136 |   0.0 |  0.20
Output  | 9.4802e-05 | 9.4802e-05 | 9.4802e-05 |   0.0 |  0.14
Modify  | 9.1117e-05 | 9.1117e-05 | 9.1117e-05 |   0.0 |  0.14
Other   |            | 6.935e-05  |            |       |  0.11

Nlocal:            256 ave         256 max         256 min
Histogram: 1 0 0 0 0 0 0 0 0 0
Nghost:            843 ave         843 max         843 min
Histogram: 1 0 0 0 0 0 0 0 0 0
Neighs:           6912 ave        6912 max        6912 min
Histogram: 1 0 0 0 0 0 0 0 0 0
FullNghs:        13824 ave       13824 max       13824 min
Histogram: 1 0 0 0 0 0 0 0 0 0

Total # of neighbors = 13824
Ave neighs/atom = 54
Neighbor list builds = 0
Dangerous builds = 0
Total wall time: 0:00:00
