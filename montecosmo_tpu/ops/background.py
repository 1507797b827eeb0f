"""Background cosmology: expansion history, growth factors, comoving distances.

Self-contained replacement for the jax_cosmo background layer the reference
leans on (`montecosmo/nbody.py:675-896`), redesigned for jit:

* `Cosmology` is a frozen NamedTuple pytree of parameters (w0waCDM).
* `Background.create(cosmo)` integrates the 1st/2nd-order growth ODE and the
  comoving-distance integral with fixed-step RK4 `lax.scan`s and returns an
  immutable table pytree.  No `_workspace` mutation: the whole construction is
  pure and traced inside jit, so gradients flow through (Omega_m, sigma8) into
  every growth/distance lookup of the forward model.
* Lookups (`a2g`, `g2a`, `a2chi`, ...) are `jnp.interp` on the tables.

Conventions match the reference: D1 normalized to D1(a=1)=1; the second-order
table is normalized so `a2g2 = -3/7 * g2_raw ~ -3/7 D1^2` (EdS); f = dlnD/dlna.
"""
from typing import NamedTuple

import numpy as np
from jax import lax, numpy as jnp

from montecosmo_tpu.utils.safe import safe_div

# Hubble radius c / (100 km/s/Mpc) in Mpc/h
RH = 2997.92458

GROWTH_LOG10_AMIN = -3.0
GROWTH_STEPS = 128
DIST_LOG10_AMIN = -3.0
DIST_STEPS = 256
# static uniform chi grid for the chi->a inverse (covers chi(a=1e-3) for any
# reasonable w0waCDM; queries beyond clamp to the a_min edge)
CHI_STEPS = 2048
CHI_GRID_MAX = 4.9 * RH


class Cosmology(NamedTuple):
    """Flat-ish w0waCDM parameter pytree (all fields traced)."""
    Omega_c: jnp.ndarray
    Omega_b: jnp.ndarray
    h: jnp.ndarray
    n_s: jnp.ndarray
    sigma8: jnp.ndarray
    Omega_k: jnp.ndarray = 0.0
    w0: jnp.ndarray = -1.0
    wa: jnp.ndarray = 0.0

    @property
    def Omega_m(self):
        return self.Omega_c + self.Omega_b

    @property
    def Omega_de(self):
        return 1.0 - self.Omega_m - self.Omega_k


# [Planck2015 XIII](arXiv:1502.01589) Table 4 last column
def Planck15(**kw) -> Cosmology:
    return Cosmology(**{**dict(Omega_c=0.2589, Omega_b=0.04860, h=0.6774,
                               n_s=0.9667, sigma8=0.8159, Omega_k=0.0,
                               w0=-1.0, wa=0.0), **kw})


# [Planck 2018 VI](arXiv:1807.06209) Table 2 last column
def Planck18(**kw) -> Cosmology:
    return Cosmology(**{**dict(Omega_c=0.2607, Omega_b=0.0490, h=0.6766,
                               n_s=0.9665, sigma8=0.8102, Omega_k=0.0,
                               w0=-1.0, wa=0.0), **kw})


# AbacusSummit base cosmology c000
def AbacusSummit0(**kw) -> Cosmology:
    return Cosmology(**{**dict(Omega_c=0.26447041, Omega_b=0.04930169, h=0.6736,
                               n_s=0.9649, sigma8=0.8076353990239834,
                               Omega_k=0.0, w0=-1.0, wa=0.0), **kw})


def get_cosmology(**params) -> Cosmology:
    """Full cosmology from the sampled parameters (Omega_m, sigma8), holding
    the other AbacusSummit0 parameters fixed.

    Parity: reference `montecosmo/bricks.py:53-59`.
    """
    ref = AbacusSummit0()
    return ref._replace(Omega_c=params["Omega_m"] - ref.Omega_b,
                        sigma8=params["sigma8"])


# ----------------------------------------------------------------------- expansion
def w_de(cosmo: Cosmology, a):
    """Dark-energy equation of state w(a) = w0 + wa (1 - a)."""
    return cosmo.w0 + cosmo.wa * (1.0 - a)


def f_de(cosmo: Cosmology, a):
    """Dark-energy density evolution rho_de(a)/rho_de(1)."""
    return a ** (-3.0 * (1.0 + cosmo.w0 + cosmo.wa)) * jnp.exp(-3.0 * cosmo.wa * (1.0 - a))


def Esqr(cosmo: Cosmology, a):
    """E^2(a) = H^2(a)/H0^2."""
    return (cosmo.Omega_m * a**-3 + cosmo.Omega_k * a**-2
            + cosmo.Omega_de * f_de(cosmo, a))


def Omega_m_a(cosmo: Cosmology, a):
    return cosmo.Omega_m * a**-3 / Esqr(cosmo, a)


def Omega_de_a(cosmo: Cosmology, a):
    return cosmo.Omega_de * f_de(cosmo, a) / Esqr(cosmo, a)


# ----------------------------------------------------------------------- background tables
def _rk4(f, y0, ts):
    """Fixed-step RK4 over the (sorted) grid `ts`; returns y at every ts."""
    def step(y, t01):
        t0, t1 = t01
        h = t1 - t0
        k1 = f(y, t0)
        k2 = f(y + h / 2 * k1, t0 + h / 2)
        k3 = f(y + h / 2 * k2, t0 + h / 2)
        k4 = f(y + h * k3, t1)
        y1 = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return y1, y1

    _, ys = lax.scan(step, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)


class Background(NamedTuple):
    """Immutable growth & distance tables for one cosmology.

    Build once per forward pass with `Background.create(cosmo)`; all lookup
    methods are pure interpolations, differentiable w.r.t. the cosmology.
    """
    cosmo: Cosmology
    a_tab: jnp.ndarray     # (GROWTH_STEPS,)
    g_tab: jnp.ndarray     # D1(a)/D1(1)
    g2_tab: jnp.ndarray    # raw D2(a)/D2(1)  (a2g2 applies the -3/7 factor)
    f_tab: jnp.ndarray     # dlnD1/dlna
    f2_tab: jnp.ndarray    # dlnD2/dlna
    a_dist: jnp.ndarray    # (DIST_STEPS,)
    chi_tab: jnp.ndarray   # comoving distance [Mpc/h], decreasing in a
    a_chi_tab: jnp.ndarray  # a at the static uniform chi grid (chi2a table)

    @classmethod
    def create(cls, cosmo: Cosmology,
               growth_steps=GROWTH_STEPS, dist_steps=DIST_STEPS,
               log10_amin=GROWTH_LOG10_AMIN):
        # NOTE: `_a_lookup` reconstructs the node grids from GROWTH_LOG10_AMIN
        # + the static table length when the Background is a jit argument;
        # a custom log10_amin is only valid for Backgrounds built in-trace.
        # ---- growth: y = [[D1, D2], [D1', D2']] (primes = d/da)
        atab = jnp.logspace(log10_amin, 0.0, growth_steps)

        def derivs(y, a):
            q = (2.0 - (Omega_m_a(cosmo, a)
                        + (1.0 + 3.0 * w_de(cosmo, a)) * Omega_de_a(cosmo, a)) / 2.0) / a
            r = 1.5 * Omega_m_a(cosmo, a) / a**2
            (g1, g2), (d1, d2) = y
            return jnp.array([[d1, d2],
                              [-q * d1 + r * g1, -q * d2 + r * g2 - r * g1**2]])

        a0 = atab[0]
        y0 = jnp.array([[a0, -3.0 / 7 * a0**2], [1.0, -6.0 / 7 * a0]])
        y = _rk4(derivs, y0, atab)

        y1, y2 = y[:, 0, 0], y[:, 0, 1]
        gtab = y1 / y1[-1]
        g2tab = y2 / y2[-1]
        ftab = y[:, 1, 0] / y1[-1] * atab / gtab
        f2tab = y[:, 1, 1] / y2[-1] * atab / g2tab

        # ---- distance: dchi/dlna = rh / (a E(a)), integrated up from a_min
        adist = jnp.logspace(log10_amin, 0.0, dist_steps)

        def dchi(y, lna):
            a = jnp.exp(lna)
            return RH / (a * jnp.sqrt(Esqr(cosmo, a)))

        chitab = _rk4(dchi, jnp.zeros(()), jnp.log(adist))
        chitab = chitab[-1] - chitab  # distance from a=1 back to a

        # invert chi(a) once onto the STATIC uniform chi grid: mesh-sized
        # chi2a queries then bracket by index arithmetic instead of
        # searchsorted over the traced table (ops/interp.py)
        chi_grid = jnp.linspace(0.0, CHI_GRID_MAX, CHI_STEPS)
        a_chi_tab = jnp.interp(chi_grid, chitab[::-1], adist[::-1])

        return cls(cosmo, atab, gtab, g2tab, ftab, f2tab, adist, chitab,
                   a_chi_tab)

    def _a_lookup(self, a, ytab, atab):
        """Interp on the log-uniform a grid: index-arithmetic bracket + one
        row gather (never searchsorted).  When a Background crosses a jit
        boundary the node VALUES are traced, but the grid is the static
        `logspace(GROWTH_LOG10_AMIN, 0, n)` by construction of `create`
        (n is the static shape), so the concrete nodes are rebuilt."""
        from montecosmo_tpu.ops.interp import uniform_interp
        try:
            nodes = np.asarray(atab)
        except Exception:  # traced nodes: jit-argument Background
            nodes = np.logspace(GROWTH_LOG10_AMIN, 0.0, atab.shape[0])
        x0 = float(np.log(nodes[0]))
        dx = float((np.log(nodes[-1]) - x0) / (nodes.size - 1))
        return uniform_interp(a, x0, dx, ytab, logx=True, xtab=nodes)

    # ---- growth lookups (parity: nbody.py:750-808)
    def a2g(self, a):
        return self._a_lookup(a, self.g_tab, self.a_tab)

    def a2g2(self, a):
        return self._a_lookup(a, self.g2_tab, self.a_tab) * (-3.0 / 7)

    def a2f(self, a):
        return self._a_lookup(a, self.f_tab, self.a_tab)

    def a2f2(self, a):
        return self._a_lookup(a, self.f2_tab, self.a_tab)

    def a2dg2dg(self, a):
        g, g2 = self.a2g(a), self.a2g2(a)
        f, f2 = self.a2f(a), self.a2f2(a)
        return safe_div(g2 * f2, g * f)  # dD2/dD1; -> 0 at a -> 0

    def g2a(self, g):
        return jnp.interp(g, self.g_tab, self.a_tab)

    def g2g2(self, g):
        return jnp.interp(g, self.g_tab, self.g2_tab) * (-3.0 / 7)

    def g2f(self, g):
        return jnp.interp(g, self.g_tab, self.f_tab)

    def g2f2(self, g):
        return jnp.interp(g, self.g_tab, self.f2_tab)

    def g2dg2dg(self, g):
        g2, f, f2 = self.g2g2(g), self.g2f(g), self.g2f2(g)
        return safe_div(g2 * f2, g * f)

    # ---- distance lookups (parity: nbody.py:817-896)
    def a2chi(self, a):
        return jnp.clip(self._a_lookup(a, self.chi_tab, self.a_dist), 0.0)

    def chi2a(self, chi):
        # pre-inverted static uniform chi grid (see create); linear grid ->
        # the grid-coordinate lerp IS the linear-x lerp
        from montecosmo_tpu.ops.interp import uniform_interp
        return uniform_interp(chi, 0.0, CHI_GRID_MAX / (CHI_STEPS - 1),
                              self.a_chi_tab)

    def k2ell(self, a, k):
        """Wavenumber -> multipole via Limber."""
        return self.a2chi(a) * k - 0.5

    def ell2k(self, a, ell):
        """Multipole -> wavenumber via Limber."""
        return (ell + 0.5) / self.a2chi(a)
