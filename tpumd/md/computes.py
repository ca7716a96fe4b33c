"""Global thermodynamic computes.

Reimplements the contracts of ComputeTemp (src/compute_temp.cpp: mv^2 sum
with dof correction), ComputePressure (src/compute_pressure.cpp:205-297:
kinetic + virial over volume) and Thermo's ke/pe keywords
(src/thermo.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp


def temperature(v, mass_per_atom, dof, boltz, mvv2e):
    """Instantaneous temperature; dof already includes -extra_dof -fix_dof."""
    ke2 = jnp.sum(mass_per_atom[:, None] * v * v)
    tfactor = mvv2e / (dof * boltz)
    return ke2 * tfactor


def kinetic_energy(t_scalar, dof, boltz):
    """Thermo 'ke' = 0.5 * dof * boltz * T (src/thermo.cpp compute_ke)."""
    return 0.5 * dof * boltz * t_scalar


def pressure(t_scalar, virial6, volume, dof, boltz, nktv2p, dimension=3):
    """Scalar pressure = (dof kB T + tr(W)) / (dim V) * nktv2p."""
    vir = virial6[0] + virial6[1] + virial6[2]
    return (dof * boltz * t_scalar + vir) / (dimension * volume) * nktv2p
