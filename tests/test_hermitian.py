"""Hermitian repack and Fourier resampling correctness.

Replicates the reference's `valid_fourier` notebook checks (rg2cgh/cgh2rg
equivalence to rfftn in distribution, chreshape power conservation, Hermitian
symmetry of outputs) as hermetic golden-value tests.
"""
import numpy as np
import jax
from jax import numpy as jnp

from montecosmo_tpu.ops.hermitian import (
    ch2rshape, r2chshape, rg2cgh, cgh2rg, chreshape, hermitian_symmetric,
    boxreshape, scale_shape, mesh2masked, masked2mesh,
)

SHAPE = (8, 6, 4)


def is_hermitian(meshk):
    """Check Hermitian symmetry of an rfft-layout tensor by round-tripping
    through irfftn/rfftn (exact iff the tensor is a valid rfft of a real field)."""
    full = jnp.fft.rfftn(jnp.fft.irfftn(meshk))
    return np.allclose(full, meshk, atol=1e-5 * np.abs(meshk).max())


def test_roundtrip_exact(rng):
    x = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    for norm in ("backward", "ortho", "forward"):
        k = rg2cgh(x, norm)
        assert k.shape == r2chshape(SHAPE)
        x2 = cgh2rg(k, norm)
        np.testing.assert_allclose(x2, x, rtol=1e-5, atol=1e-5)


def test_inverse_on_hermitian_input(rng):
    x = rng.standard_normal(SHAPE)
    k = jnp.fft.rfftn(jnp.asarray(x))
    k2 = rg2cgh(cgh2rg(k))
    np.testing.assert_allclose(k2, k, rtol=1e-4, atol=1e-4 * np.abs(np.asarray(k)).max())


def test_output_is_hermitian(rng):
    x = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    assert is_hermitian(rg2cgh(x))


def test_distribution_matches_rfftn(rng):
    """Per-coefficient variances of rg2cgh(N(0,I)) match rfftn(N(0,I))."""
    n_draws = 4000
    xs = rng.standard_normal((n_draws, *SHAPE)).astype(np.float32)
    ks_repack = jax.vmap(rg2cgh)(jnp.asarray(xs))
    ks_fft = jnp.fft.rfftn(jnp.asarray(xs), axes=(1, 2, 3))

    for part in (np.real, np.imag):
        v1 = part(np.asarray(ks_repack)).var(0)
        v2 = part(np.asarray(ks_fft)).var(0)
        # variances are n/2 (or n, or 0) per coefficient; compare relative to n
        np.testing.assert_allclose(v1 / np.prod(SHAPE), v2 / np.prod(SHAPE),
                                   atol=0.12)


def test_mean_amp_transport(rng):
    """rg2cgh(mean + amp*N(0,I)) ~ meank + ampk * rfftn(N(0,I))."""
    meank = jnp.fft.rfftn(jnp.asarray(rng.standard_normal(SHAPE)))
    mean = cgh2rg(meank)
    # constant amplitude field for an exact check of the mean transport
    k = rg2cgh(mean)
    np.testing.assert_allclose(np.asarray(k), np.asarray(meank), rtol=1e-4,
                               atol=1e-4 * np.abs(np.asarray(meank)).max())


def test_amp_norm(rng):
    """'amp' transports a per-mode std field into the real packing: each real
    cell receives the std of the coefficient it feeds."""
    std_k = jnp.asarray(np.abs(rng.standard_normal(r2chshape(SHAPE))) + 0.5)
    scale = cgh2rg(std_k, norm="amp")
    assert scale.shape == SHAPE
    # sampling with that scale then repacking gives coefficients whose
    # real/imag std matches ~ sqrt(n/2)*std_k on free modes
    n_draws = 3000
    xs = rng.standard_normal((n_draws, *SHAPE)).astype(np.float32) * np.asarray(scale)
    ks = jax.vmap(rg2cgh)(jnp.asarray(xs))
    v = np.asarray(ks.real).var(0)
    expect = np.prod(SHAPE) / 2 * np.asarray(std_k) ** 2
    bulk = np.s_[:, :, 1:-1]
    np.testing.assert_allclose(v[bulk] / expect[bulk], 1.0, atol=0.25)


def test_chreshape_identity(rng):
    k = jnp.fft.rfftn(jnp.asarray(rng.standard_normal(SHAPE)))
    np.testing.assert_allclose(chreshape(k, k.shape), k)


def test_chreshape_pad_preserves_power_and_symmetry(rng):
    x = rng.standard_normal(SHAPE)
    k = jnp.fft.rfftn(jnp.asarray(x))
    big = r2chshape((12, 10, 8))
    kp = chreshape(k, big)
    assert kp.shape == big
    assert is_hermitian(kp)
    # mean power per mode scales with the squared resolution ratio (delta
    # contrast preserved): sum|k|^2 * 1/n is the real-space variance * n
    var_in = np.asarray(jnp.fft.irfftn(k)).var()
    var_out = np.asarray(jnp.fft.irfftn(kp)).var()
    np.testing.assert_allclose(var_out, var_in, rtol=1e-5)


def test_chreshape_pad_then_truncate_is_identity(rng):
    x = rng.standard_normal(SHAPE)
    k = jnp.fft.rfftn(jnp.asarray(x))
    big = r2chshape((16, 12, 8))
    k2 = chreshape(chreshape(k, big), k.shape)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k), rtol=1e-4,
                               atol=1e-6 * np.abs(np.asarray(k)).max())


def test_chreshape_truncate_white_preserves_power(rng):
    """Truncating white noise preserves the physical power spectrum at the
    surviving modes: real-space variance scales as n_out/n_in (fewer modes,
    same per-mode power)."""
    n_draws = 500
    small_r = (4, 4, 4)
    small = r2chshape(small_r)
    xs = rng.standard_normal((n_draws, *SHAPE)).astype(np.float32)
    ks = jnp.fft.rfftn(jnp.asarray(xs), axes=(1, 2, 3))
    kt = jax.vmap(lambda k: chreshape(k, small))(ks)
    var_in = np.asarray(jax.vmap(jnp.fft.irfftn)(ks)).var()
    var_out = np.asarray(jax.vmap(jnp.fft.irfftn)(kt)).var()
    expect = np.prod(small_r) / np.prod(SHAPE)
    np.testing.assert_allclose(var_out / var_in, expect, rtol=0.1)


def test_hermitian_symmetric_fixed_point(rng):
    x = rng.standard_normal((6, 4))
    full = jnp.fft.fftn(jnp.asarray(x))  # full FFT of real field IS Hermitian
    np.testing.assert_allclose(np.asarray(hermitian_symmetric(full)), np.asarray(full),
                               atol=1e-4 * float(jnp.abs(full).max()))


def test_boxreshape_and_scale_shape():
    m = jnp.arange(8 * 6 * 4, dtype=jnp.float32).reshape(8, 6, 4)
    out = boxreshape(m, (4, 6, 8))
    assert out.shape == (4, 6, 8)
    np.testing.assert_allclose(out[:, :, 2:6], m[2:6])
    assert scale_shape((64, 64, 64), 1.5) == (96, 96, 96)
    assert scale_shape((64, 64, 64), 7 / 4) == (112, 112, 112)


def test_masking_roundtrip(rng):
    mask = rng.standard_normal(SHAPE) > 0
    x = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    packed = mesh2masked(x, mask)
    back = masked2mesh(packed, mask)
    np.testing.assert_allclose(np.asarray(back)[mask], np.asarray(x)[mask])
    assert np.all(np.asarray(back)[~mask] == 0)
