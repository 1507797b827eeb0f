"""Linear matter power spectrum: Eisenstein & Hu (1998) transfer with BAO,
sigma8-normalized, fully differentiable in the cosmological parameters.

Replaces the jax_cosmo dependency of the reference
(`montecosmo/bricks.py:68-106` uses `jax_cosmo.power.linear_matter_power`).
Formulas from EH98 (astro-ph/9709112); wavenumbers are comoving h/Mpc.
"""
import numpy as np
from jax import numpy as jnp

from montecosmo_tpu.ops.background import Background, Cosmology

TCMB = 2.726  # K


def eisenstein_hu_transfer(cosmo: Cosmology, k):
    """EH98 matter transfer function with baryon acoustic oscillations.

    k in h/Mpc; returns T(k) normalized to 1 at k -> 0.
    """
    h = cosmo.h
    om = cosmo.Omega_m * h**2
    ob = cosmo.Omega_b * h**2
    fb = cosmo.Omega_b / cosmo.Omega_m
    fc = 1.0 - fb
    theta = TCMB / 2.7

    kmpc = k * h  # 1/Mpc

    # scales
    z_eq = 2.50e4 * om * theta**-4
    k_eq = 7.46e-2 * om * theta**-2  # 1/Mpc
    b1 = 0.313 * om**-0.419 * (1 + 0.607 * om**0.674)
    b2 = 0.238 * om**0.223
    z_d = 1291.0 * om**0.251 / (1 + 0.659 * om**0.828) * (1 + b1 * ob**b2)

    def R_of(z):
        return 31.5 * ob * theta**-4 * (1e3 / z)

    R_d, R_eq = R_of(z_d), R_of(z_eq)
    s = (2.0 / (3 * k_eq) * jnp.sqrt(6.0 / R_eq)
         * jnp.log((jnp.sqrt(1 + R_d) + jnp.sqrt(R_d + R_eq)) / (1 + jnp.sqrt(R_eq))))
    k_silk = 1.6 * ob**0.52 * om**0.73 * (1 + (10.4 * om)**-0.95)  # 1/Mpc

    q = kmpc / (13.41 * k_eq)

    # CDM piece
    a1 = (46.9 * om)**0.670 * (1 + (32.1 * om)**-0.532)
    a2 = (12.0 * om)**0.424 * (1 + (45.0 * om)**-0.582)
    alpha_c = a1**(-fb) * a2**(-fb**3)
    bb1 = 0.944 / (1 + (458.0 * om)**-0.708)
    bb2 = (0.395 * om)**-0.0266
    beta_c = 1.0 / (1 + bb1 * (fc**bb2 - 1))

    def T0(q, alpha, beta):
        C = 14.2 / alpha + 386.0 / (1 + 69.9 * q**1.08)
        L = jnp.log(jnp.e + 1.8 * beta * q)
        return L / (L + C * q**2)

    f = 1.0 / (1 + (kmpc * s / 5.4)**4)
    Tc = f * T0(q, 1.0, beta_c) + (1 - f) * T0(q, alpha_c, beta_c)

    # baryon piece
    y = (1 + z_eq) / (1 + z_d)
    sy = jnp.sqrt(1 + y)
    Gy = y * (-6 * sy + (2 + 3 * y) * jnp.log((sy + 1) / (sy - 1)))
    alpha_b = 2.07 * k_eq * s * (1 + R_d)**-0.75 * Gy
    beta_b = 0.5 + fb + (3 - 2 * fb) * jnp.sqrt((17.2 * om)**2 + 1)
    beta_node = 8.41 * om**0.435
    s_tilde = s / (1 + (beta_node / (kmpc * s))**3)**(1.0 / 3)
    x = kmpc * s_tilde
    j0 = jnp.sinc(x / jnp.pi)  # sin(x)/x
    Tb = (T0(q, 1.0, 1.0) / (1 + (kmpc * s / 5.2)**2)
          + alpha_b / (1 + (beta_b / (kmpc * s))**3) * jnp.exp(-(kmpc / k_silk)**1.4)) * j0

    return fb * Tb + fc * Tc


def _sigma_r(cosmo: Cosmology, pk_unnorm_fn, r=8.0, n=512):
    """RMS of the density field smoothed with a top-hat of radius r [Mpc/h]."""
    lnk = jnp.linspace(np.log(1e-4), np.log(1e1), n)
    k = jnp.exp(lnk)
    x = k * r
    w = 3.0 * (jnp.sin(x) - x * jnp.cos(x)) / x**3
    integrand = k**3 * pk_unnorm_fn(k) / (2 * np.pi**2) * w**2
    return jnp.sqrt(jnp.trapezoid(integrand, lnk))


def lin_power(cosmo: Cosmology, a=1.0, kpow=None, n_interp=256, bg: Background = None):
    """Tabulated linear matter power spectrum (k [h/Mpc], P [(Mpc/h)^3]).

    * kpow given: (k, P/sigma8^2) table scaled by the sampled sigma8^2
      (register-file path).
    * kpow None: EH98 emulation normalized so sigma8(a=1) = cosmo.sigma8.
    At a != 1 the spectrum is scaled by the linear growth D(a)^2.
    """
    if kpow is None:
        ks = jnp.logspace(-4, 1, n_interp)
        raw = lambda k: k**cosmo.n_s * eisenstein_hu_transfer(cosmo, k)**2
        norm = (cosmo.sigma8 / _sigma_r(cosmo, raw))**2
        pows = raw(ks) * norm
    else:
        ks, pows = kpow
        ks, pows = jnp.asarray(ks), jnp.asarray(pows) * cosmo.sigma8**2
    if not (isinstance(a, float) and a == 1.0):
        if bg is None:
            bg = Background.create(cosmo)
        pows = pows * bg.a2g(a)**2
    return ks, pows


def lin_power_interp(cosmo: Cosmology, a=1.0, kpow=None, n_interp=256, bg=None):
    """Return an interpolator k-mesh -> P(k).

    Linear-space interpolation on log-spaced nodes: handles k=0 exactly and
    avoids the nan gradients of log-log interpolation at the origin.
    Mesh-sized queries run on the uniform-grid fast path (index arithmetic +
    one row gather) instead of jnp.interp's latency-bound searchsorted —
    the node grids are log-uniform (EH98) or resampled once (register
    tables) by `log_uniform_interp_fn`.
    """
    from montecosmo_tpu.ops.interp import log_uniform_interp_fn

    ks, pows = lin_power(cosmo, a=a, kpow=kpow, n_interp=n_interp, bg=bg)
    nodes = np.logspace(-4, 1, n_interp) if kpow is None else kpow[0]
    return log_uniform_interp_fn(nodes, pows, left=0.0, right=0.0)


def lin_power_mesh(cosmo: Cosmology, mesh_shape: tuple, box_size, a=1.0,
                   kpow=None, n_interp=256, bg=None, like=None):
    """Linear matter power spectrum evaluated on the rfft wavenumber mesh
    (physical units [(Mpc/h)^3]).

    `like`: optional tracer to tie the k mesh to (fourier.lazy_kvec) so the
    N^3 power mesh stages on device instead of becoming a program literal."""
    from montecosmo_tpu.ops.fourier import lazy_kvec, rfftk

    pow_fn = lin_power_interp(cosmo, a=a, kpow=kpow, n_interp=n_interp, bg=bg)
    kvec = rfftk(mesh_shape, box_size)
    if like is not None:
        kvec = lazy_kvec(kvec, like)
    kmesh = sum(ki**2 for ki in kvec) ** 0.5
    return pow_fn(kmesh)
