"""Classic Ewald summation (kspace_style ewald).

Reimplements src/KSPACE/ewald.cpp: dense k-space sum
E = (2 pi / V) sum_k |S(k)|^2 exp(-k^2/4g^2)/k^2 with structure factors
S(k) = sum_i q_i exp(i k.r_i), per-atom forces from the S(k) gradients,
the same g_ewald estimate and the gsqmx k-cutoff from the accuracy model.

TPU-native: the (natoms x nk) phase matrix is a dense matmul-shaped
computation — this style is MXU-friendly and often beats PPPM for small
or high-accuracy systems on TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

MY_PIS = 1.77245385090551602729


class Ewald:
    style = "ewald"

    def __init__(self, accuracy_relative: float):
        self.accuracy_relative = float(accuracy_relative)
        self.g_ewald = 0.0

    def init(self, sim):
        u = sim.units
        self.qqrd2e = u.qqr2e
        q = np.asarray(jax.device_get(sim.state.q), dtype=np.float64)
        self.qsum = float(q.sum())
        self.qsqsum = float((q * q).sum())
        self.q2 = self.qsqsum * self.qqrd2e
        natoms = sim.natoms
        self.accuracy = self.accuracy_relative * u.qqr2e
        cutoff = sim.pair.cut_coul
        lo = np.asarray(jax.device_get(sim.state.box.lo), dtype=np.float64)
        hi = np.asarray(jax.device_get(sim.state.box.hi), dtype=np.float64)
        prd = hi - lo
        # g_ewald estimate (KSpace, same as PPPM's initial value)
        acc = self.accuracy
        g = acc * np.sqrt(natoms * cutoff * prd.prod()) / (2.0 * self.q2)
        if g >= 1.0:
            g = (1.35 - 0.15 * np.log(acc)) / cutoff
        else:
            g = np.sqrt(-np.log(g)) / cutoff
        self.g_ewald = g
        sim.pair.g_ewald = g

        # per-dimension kmax from the rms error estimate (Ewald::rms/setup)
        def rms(km, prd_d):
            return (2.0 * self.q2 * g / prd_d
                    * np.sqrt(1.0 / (np.pi * km * natoms))
                    * np.exp(-np.pi**2 * km * km / (g * g * prd_d * prd_d)))

        kmax = []
        for d in range(3):
            km = 1
            while rms(km, prd[d]) > acc:
                km += 1
            kmax.append(km)
        unitk = 2 * np.pi / prd
        gsqmx = max((unitk[d] * kmax[d]) ** 2 for d in range(3))
        # build k vectors (half-space, factor 2 in energy)
        ks = []
        for kx in range(0, kmax[0] + 1):
            ky_lo = -kmax[1] if kx > 0 else 0
            for ky in range(ky_lo, kmax[1] + 1):
                kz_lo = -kmax[2] if (kx > 0 or ky != 0) else 1
                for kz in range(kz_lo, kmax[2] + 1):
                    kvec = unitk * np.array([kx, ky, kz], dtype=np.float64)
                    ksq = float(kvec @ kvec)
                    if 0 < ksq <= gsqmx:
                        ks.append((kvec, ksq))
        self.kvecs = np.array([k for k, _ in ks])
        ksq = np.array([s for _, s in ks])
        self.ug = np.exp(-0.25 * ksq / (g * g)) / ksq  # prefactors (x 2pi/V)

    def compute(self, s, eflag: bool, vflag: bool):
        dt_ = s.x.dtype
        kv = jnp.asarray(self.kvecs, dt_)           # (K, 3)
        ug = jnp.asarray(self.ug, dt_)              # (K,)
        vol = s.box.volume
        pref = 2.0 * jnp.pi / vol
        q = s.q
        phase = s.x @ kv.T                          # (N, K)
        c = jnp.cos(phase)
        sn = jnp.sin(phase)
        Sr = jnp.sum(q[:, None] * c, axis=0)        # (K,)
        Si = jnp.sum(q[:, None] * sn, axis=0)
        # forces: f_i = 2 * qqrd2e * pref * q_i sum_k 2 ug_k k
        #   (sin(kr_i) Sr - cos(kr_i) Si)   [half-space => x2]
        w = 2.0 * ug
        coef = (sn * Sr[None, :] - c * Si[None, :]) * w[None, :]
        f = 2.0 * self.qqrd2e * pref * q[:, None] * (coef @ kv)
        elong = None
        virial = None
        if eflag:
            e = 2.0 * pref * jnp.sum(ug * (Sr * Sr + Si * Si))
            e = e - self.g_ewald * self.qsqsum / MY_PIS \
                - 0.5 * jnp.pi * self.qsum ** 2 \
                / (self.g_ewald ** 2 * vol)
            elong = self.qqrd2e * e
        if vflag:
            sk2 = Sr * Sr + Si * Si
            ksq = jnp.sum(kv * kv, axis=1)
            vterm = 2.0 * (1.0 / ksq + 0.25 / (self.g_ewald ** 2))
            comp = []
            for a, b in ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)):
                delta = 1.0 if a == b else 0.0
                comp.append(2.0 * pref * self.qqrd2e * jnp.sum(
                    ug * sk2 * (delta - vterm * kv[:, a] * kv[:, b])))
            virial = jnp.stack(comp)
        return f, elong, virial
