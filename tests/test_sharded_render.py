"""Pod-scale forward render: the fully X-sharded white->linear->Zel'dovich->
paint pipeline equals the single-device render."""
import numpy as np
import pytest
import jax
from jax import numpy as jnp, random as jr
from jax.sharding import Mesh

from montecosmo_tpu.ops.background import Background, Planck18
from montecosmo_tpu.ops.fourier import gradient_hat, invlaplace_hat, rfftk
from montecosmo_tpu.ops.paint import paint
from montecosmo_tpu.ops.power import lin_power_interp
from montecosmo_tpu.parallel.render import sharded_zeldovich_density

SHAPE = (32, 16, 16)
BOX = np.array([400.0, 200.0, 200.0])


def reference_density(white, bg, pow_fn, a):
    """Single-device version of the same pipeline."""
    k = jnp.fft.rfftn(white)
    kvec = rfftk(SHAPE, BOX)
    kmesh = sum(ki**2 for ki in kvec) ** 0.5
    cell_per_box = np.prod(np.divide(SHAPE, BOX))
    lin = k * (pow_fn(kmesh) * cell_per_box) ** 0.5

    pot = lin * invlaplace_hat(kvec)
    cell = np.divide(BOX, SHAPE)
    grads = [jnp.fft.irfftn(-gradient_hat(kvec, i) * pot) / cell[i]
             for i in range(3)]
    lattice = jnp.stack(jnp.meshgrid(*[jnp.arange(float(s)) for s in SHAPE],
                                     indexing="ij"), -1)
    pos = (lattice + float(bg.a2g(a)) * jnp.stack(grads, -1)).reshape(-1, 3)
    return paint(pos, SHAPE, order=2)


def test_sharded_render_matches_single_device(rng):
    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))

    cosmo = Planck18()
    bg = Background.create(cosmo)
    pow_fn = lin_power_interp(cosmo)
    a = 0.5

    white = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    got = sharded_zeldovich_density(white, bg, BOX, a, mesh, pow_fn, halo=4)
    expect = reference_density(white, bg, pow_fn, a)

    np.testing.assert_allclose(float(got.sum()), float(np.prod(SHAPE)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-3, atol=2e-3)
    # it is a real density field with structure
    assert float(got.std()) > 0.05
