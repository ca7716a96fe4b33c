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
        # full-f32 matmul: TPU default (bf16 passes) loses ~1 rad of phase
        phase = jnp.matmul(s.x, kv.T,
                           precision=jax.lax.Precision.HIGHEST)  # (N, K)
        c = jnp.cos(phase)
        sn = jnp.sin(phase)
        Sr = jnp.sum(q[:, None] * c, axis=0)        # (K,)
        Si = jnp.sum(q[:, None] * sn, axis=0)
        # forces: f_i = 2 * qqrd2e * pref * q_i sum_k 2 ug_k k
        #   (sin(kr_i) Sr - cos(kr_i) Si)   [half-space => x2]
        w = 2.0 * ug
        coef = (sn * Sr[None, :] - c * Si[None, :]) * w[None, :]
        f = 2.0 * self.qqrd2e * pref * q[:, None] * jnp.matmul(
            coef, kv, precision=jax.lax.Precision.HIGHEST)
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


class EwaldDisp(Ewald):
    """kspace_style ewald/disp: coulomb + geometric-mixing 1/r^6
    dispersion in one k-space sum (src/KSPACE/ewald_disp.cpp).

    The dispersion structure factor S_B(k) = sum_i B_i e^{ik.x} with
    B_i = sqrt(lj4_ii) = sqrt(4 eps_i sigma_i^6) (init_coeffs :544-556);
    per-k coefficient ke_6 = -h^3(sqrt(pi) erfc(b) + (0.5/b^2-1)
    e^{-b^2}/b), b = h/(2g) (coefficients :497-530); energy prefactor
    2 pi sqrt(pi)/(24 V) and the self/volume corrections of init_self
    (:640-643).  Dispersion forces come from jax.grad of the traced
    k-sum — exactly consistent with the energy by construction."""

    style = "ewald/disp"

    def init(self, sim):
        super().init(sim)
        pair = sim.pair
        if not hasattr(pair, "lj4"):
            raise ValueError("ewald/disp requires an lj/long pair style")
        lj4 = np.asarray(pair.lj4)
        nt = lj4.shape[0] - 1
        B = np.zeros(nt + 1)
        for i in range(1, nt + 1):
            B[i] = np.sqrt(abs(lj4[i, i]))
        typ = np.asarray(jax.device_get(sim.state.type))
        self.Bq = np.where(typ > 0, B[np.clip(typ, 0, nt)], 0.0)
        self.bsum = float(self.Bq.sum())
        self.b2sum = float((self.Bq ** 2).sum())
        # dispersion splitting parameter: g_ewald_6 defaults to g_ewald
        # (EwaldDisp::init :285)
        self.g_ewald_6 = self.g_ewald
        pair.g_ewald_6 = self.g_ewald_6

        # rebuild the k set with EwaldDisp's combined rms (coulomb + LJ
        # term, :352-366) and its nbox/gsqmx acceptance (:300-334,
        # :385-406) — the dispersion kernel converges slowly in k, so
        # the set must match the reference's exactly
        lo = np.asarray(jax.device_get(sim.state.box.lo), np.float64)
        hi = np.asarray(jax.device_get(sim.state.box.hi), np.float64)
        prd = hi - lo
        g = self.g_ewald
        g2 = g * g
        g7 = g2 * g2 * g2 * g
        natoms = sim.natoms
        acc = self.accuracy

        def rms(km, prd_d):
            v = (2.0 * self.q2 * g / prd_d
                 * np.sqrt(1.0 / (np.pi * km * natoms))
                 * np.exp(-np.pi ** 2 * km * km / (g2 * prd_d * prd_d)))
            v += (4.0 * self.b2sum * g7 / 3.0
                  * np.sqrt(1.0 / (np.pi * natoms))
                  * np.exp(-np.pi ** 2 * km * km / (g2 * prd_d * prd_d))
                  * (np.pi * km / (g * prd_d) + 1.0))
            return v

        kmax = []
        for d in range(3):
            km = 1
            while rms(km, prd[d]) > acc:
                km += 1
            kmax.append(km)
        nbox = max(kmax)
        unitk = 2.0 * np.pi / prd
        gsqmx = max((unitk[d] * kmax[d]) ** 2 for d in range(3)) * 1.00001
        ks = []
        for kx in range(0, nbox + 1):
            for ky in range(-nbox, nbox + 1):
                for kz in range(-nbox, nbox + 1):
                    if kx == 0 and ky == 0 and kz == 0:
                        continue
                    if kx == 0 and ky < 0:
                        continue
                    if kx == 0 and ky == 0 and kz < 0:
                        continue
                    kvec = unitk * np.array([kx, ky, kz], np.float64)
                    ksqv = float(kvec @ kvec)
                    if ksqv <= gsqmx:
                        ks.append((kvec, ksqv))
        self.kvecs = np.array([k for k, _ in ks])
        ksq = np.array([s for _, s in ks])
        self.ug = np.exp(-0.25 * ksq / g2) / ksq
        h1 = np.sqrt(ksq)
        b = 0.5 * h1 / self.g_ewald_6
        import math
        erfc_b = np.array([math.erfc(v) for v in b])
        expb2 = np.exp(-b * b)
        self.ke6 = -h1 * ksq * (MY_PIS * erfc_b
                                + (0.5 / (b * b) - 1.0) * expb2 / b)
        self.kv6_c2 = 3.0 * h1 * (MY_PIS * erfc_b - expb2 / b)

    def compute(self, s, eflag: bool, vflag: bool):
        f, elong, virial = super().compute(s, eflag, vflag)
        dt_ = s.x.dtype
        kv = jnp.asarray(self.kvecs, dt_)
        ke6 = jnp.asarray(self.ke6, dt_)
        Bq = jnp.asarray(self.Bq, dt_)
        vol = s.box.volume
        g3 = self.g_ewald_6 ** 3
        c1 = 2.0 * jnp.pi * MY_PIS / (24.0 * vol)

        def e6_of(x):
            phase = jnp.matmul(x, kv.T,
                               precision=jax.lax.Precision.HIGHEST)
            Sr = jnp.sum(Bq[:, None] * jnp.cos(phase), axis=0)
            Si = jnp.sum(Bq[:, None] * jnp.sin(phase), axis=0)
            # c1 = 2 pi sqrt(pi)/(24V) already carries the half-space
            # symmetry factor (full-space constant is pi sqrt(pi)/(24V))
            return c1 * jnp.sum(ke6 * (Sr * Sr + Si * Si)), (Sr, Si)

        (e6, (Sr, Si)), grads = jax.value_and_grad(
            e6_of, has_aux=True)(s.x)
        f = f - grads
        if eflag:
            virial_self6 = jnp.pi * MY_PIS * g3 / (6.0 * vol) \
                * self.bsum ** 2
            energy_self6 = -self.b2sum * g3 * g3 / 12.0 + virial_self6
            elong = elong + e6 - energy_self6
        if vflag:
            sk2 = Sr * Sr + Si * Si
            c2 = jnp.asarray(self.kv6_c2, dt_)
            virial_self6 = jnp.pi * MY_PIS * g3 / (6.0 * vol) \
                * self.bsum ** 2
            comp = []
            for a, b in ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)):
                delta = ke6 if a == b else jnp.zeros_like(ke6)
                comp.append(c1 * jnp.sum(
                    (delta - c2 * kv[:, a] * kv[:, b]) * sk2))
            v6 = jnp.stack(comp)
            v6 = v6 - virial_self6 * jnp.asarray(
                [1.0, 1.0, 1.0, 0.0, 0.0, 0.0], dt_)
            virial = virial + v6
        return f, elong, virial
