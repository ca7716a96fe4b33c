"""Example tpumd plugin: a user pair style in pure Python/JAX.

The TPU-native analog of the reference's dlopen plugin mechanism
(src/plugin.cpp, examples/plugins/morse2plugin.cpp): `plugin load
pair_plugin.py` executes this module, whose decorators register the
style with the session registries — after which input scripts can use
`pair_style spring/contact` like any built-in.
"""

import numpy as np

from tpumd.models.base import PairStyle
from tpumd.models.registry import register_pair


@register_pair("spring/contact")
class PairSpringContact(PairStyle):
    """E = k (r - rc)^2 for r < rc (purely repulsive soft contact)."""

    name = "spring/contact"

    def settings(self, cut):
        self.cut_global = float(cut)
        self.k = np.zeros((self.ntypes + 1, self.ntypes + 1))

    def coeff(self, ilo, ihi, jlo, jhi, k, *rest):
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.k[i, j] = self.k[j, i] = float(k)
                self._setflag[i, j] = True

    def init(self):
        pass

    @property
    def max_cutoff(self) -> float:
        return self.cut_global

    def pair_fn(self, r2, itype, jtype):
        import jax.numpy as jnp
        dtype = r2.dtype
        rc = jnp.asarray(self.cut_global, dtype)
        k = self.coef(self.k, itype, jtype, dtype)
        r = jnp.sqrt(r2)
        inside = r < rc
        e = jnp.where(inside, k * (r - rc) ** 2, 0.0)
        # f_ij = fpair * (x_i - x_j);  fpair = -(dE/dr)/r
        fpair = jnp.where(inside, -2.0 * k * (r - rc) / r, 0.0)
        return fpair, e, None, None


__tpumd_styles__ = ("spring/contact",)
