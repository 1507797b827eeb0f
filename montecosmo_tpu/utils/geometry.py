"""Sky <-> cartesian coordinate helpers.

Parity: reference `montecosmo/utils.py:1186-1222`.
"""
import numpy as np
from jax import numpy as jnp
from jax.scipy.special import gammaln

from montecosmo_tpu.utils.safe import safe_div


def radecrad2cart(ra, dec, radius):
    """(RA, DEC) in degrees + radius -> cartesian (..., 3)."""
    ra = jnp.deg2rad(ra)
    dec = jnp.deg2rad(dec)
    x = jnp.cos(dec) * jnp.cos(ra)
    y = jnp.cos(dec) * jnp.sin(ra)
    z = jnp.sin(dec)
    return jnp.moveaxis(radius * jnp.stack((x, y, z)), 0, -1)


def cart2radecrad(cart):
    """Cartesian (..., 3) -> (RA in [0,360], DEC in [-90,90], radius)."""
    cart = jnp.asarray(cart)
    radius = jnp.linalg.norm(cart, axis=-1)
    x, y, z = jnp.moveaxis(cart, -1, 0)
    ra = jnp.rad2deg(jnp.arctan2(y, x)) % 360.0
    dec = jnp.rad2deg(jnp.arcsin(safe_div(z, radius)))
    return ra, dec, radius


def surface_hypersphere(d, R=1):
    """Surface of the (d-1)-sphere embedded in dimension d."""
    log_surf = np.log(2) + d / 2 * np.log(np.pi) + (d - 1) * np.log(R) - gammaln(d / 2)
    return np.exp(log_surf)


def volume_hypersphere(d, R=1):
    """Volume of the d-ball."""
    log_vol = d / 2 * np.log(np.pi) + d * np.log(R) - gammaln(d / 2 + 1)
    return np.exp(log_vol)
