"""Distributed primitives on the virtual 8-device CPU mesh: pencil FFT,
halo-exchanged painting, sharded chains."""
import numpy as np
import pytest
import jax
from jax import numpy as jnp, random as jr
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from montecosmo_tpu.ops.paint import paint, read
from montecosmo_tpu.parallel import (
    halo_paint, halo_read, make_device_mesh, map_chains,
    pencil_irfftn, pencil_rfftn, sharded_poisson_forces_mesh,
)

SHAPE = (16, 16, 16)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_device_mesh(n_chains=1, n_mesh=8)


def spatial_mesh(mesh):
    # 1D sub-mesh over the 8 'mesh' devices
    return Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))


def test_pencil_rfftn_matches_reference(mesh, rng):
    m = spatial_mesh(mesh)
    x = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    expect = jnp.fft.rfftn(x)
    got = pencil_rfftn(x, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-3)


def test_pencil_roundtrip(mesh, rng):
    m = spatial_mesh(mesh)
    x = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    back = pencil_irfftn(pencil_rfftn(x, m), m)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_pencil_output_sharding(mesh, rng):
    m = spatial_mesh(mesh)
    x = jax.device_put(jnp.asarray(rng.standard_normal(SHAPE), jnp.float32),
                       NamedSharding(m, P("mesh", None, None)))
    k = pencil_rfftn(x, m)
    # output is Y-sharded
    assert k.sharding.spec == P(None, "mesh", None)


def test_sharded_poisson_forces(mesh, rng):
    """Sharded Poisson force meshes equal the single-device pipeline."""
    from montecosmo_tpu.ops.fourier import gradient_hat, invlaplace_hat, rfftk

    m = spatial_mesh(mesh)
    delta = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    got = sharded_poisson_forces_mesh(delta, m)

    kvec = rfftk(SHAPE)
    pot = jnp.fft.rfftn(delta) * invlaplace_hat(kvec)
    expect = jnp.stack([jnp.fft.irfftn(-gradient_hat(kvec, i) * pot)
                        for i in range(3)], -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-3, atol=1e-4)


def _slab_sorted_positions(rng, n, p=8):
    """Positions sorted into X-slab ownership, padded to equal counts."""
    pos = rng.uniform(0, SHAPE[0], size=(n, 3)).astype(np.float32)
    owner = np.floor(pos[:, 0]).astype(int) // (SHAPE[0] // p)
    order = np.argsort(owner, kind="stable")
    pos, owner = pos[order], owner[order]
    counts = np.bincount(owner, minlength=p)
    m = counts.max()
    out = np.zeros((p, m, 3), np.float32)
    wgt = np.zeros((p, m), np.float32)
    fill = np.zeros(p, int)
    for q, o in zip(pos, owner):
        out[o, fill[o]] = q
        wgt[o, fill[o]] = 1.0
        fill[o] += 1
    # padding particles sit at the slab start with zero weight
    for i in range(p):
        out[i, fill[i]:] = [i * SHAPE[0] // p, 0, 0]
    return pos, out.reshape(p * m, 3), wgt.reshape(p * m)


def test_halo_paint_matches_paint(mesh, rng):
    m = spatial_mesh(mesh)
    pos_all, pos_sharded, wgt = _slab_sorted_positions(rng, 600)
    got = halo_paint(jnp.asarray(pos_sharded), SHAPE, m,
                     weights=jnp.asarray(wgt), order=2)
    expect = paint(jnp.asarray(pos_all), SHAPE, order=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_halo_read_matches_read(mesh, rng):
    m = spatial_mesh(mesh)
    field = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    pos_all, pos_sharded, wgt = _slab_sorted_positions(rng, 600)
    got = halo_read(jnp.asarray(pos_sharded), field, m, order=2)
    expect = read(jnp.asarray(pos_sharded), field, order=2)
    np.testing.assert_allclose(np.asarray(got) * wgt, np.asarray(expect) * wgt,
                               rtol=1e-4, atol=1e-4)


def test_map_chains(rng):
    def one_chain(key, x):
        return dict(y=x * 2 + jr.normal(key, ()) * 0.0)

    n_chains = 4
    keys = jr.split(jr.key(0), n_chains)
    xs = jnp.arange(float(n_chains))
    out = map_chains(one_chain, n_chains)(keys, xs)
    np.testing.assert_allclose(np.asarray(out["y"]), np.asarray(xs) * 2)


def test_halo_paint_window_matches_paint(mesh, rng):
    """Scatter-free halo painting == plain paint for slab-sharded
    lattice-ordered particles."""
    from montecosmo_tpu.parallel.halo import halo_paint_window

    m = spatial_mesh(mesh)
    shape = lat = (64, 16, 16)
    sites = np.stack(np.meshgrid(*(np.arange(s) for s in shape),
                                 indexing="ij"), -1).reshape(-1, 3)
    disp = rng.uniform(-3, 3, size=sites.shape)
    pos = jnp.asarray(sites + disp, jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, size=len(pos)), jnp.float32)

    got = halo_paint_window(pos, shape, lat, m, weights=w, order=2,
                            max_disp=3, halo=6)
    expect = paint(pos % jnp.asarray(shape, jnp.float32), shape, w, order=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)

    # gradient parity through the shard_map
    probe = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    g_got = jax.grad(lambda p, w: jnp.vdot(halo_paint_window(
        p, shape, lat, m, weights=w, order=2, max_disp=3, halo=6), probe),
        (0, 1))(pos, w)
    g_ref = jax.grad(lambda p, w: jnp.vdot(paint(
        p % jnp.asarray(shape, jnp.float32), shape, w, order=2), probe),
        (0, 1))(pos, w)
    for r, g, name in zip(g_ref, g_got, ("pos", "weights")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_map_chains_respects_mesh_context():
    """Inside a spatial mesh_context, map_chains must not claim a
    conflicting device subset: spatial-only context -> replicated chains;
    ('chains','mesh') context -> its chains axis."""
    import jax
    import numpy as np
    from jax import numpy as jnp
    from jax.sharding import Mesh

    from montecosmo_tpu.parallel.chains import map_chains
    from montecosmo_tpu.parallel.context import mesh_context

    fn = lambda x: 2.0 * x
    xs = jnp.arange(4.0)

    devs = np.asarray(jax.devices())
    with mesh_context(Mesh(devs, ("mesh",))):          # spatial-only
        out = map_chains(fn, 4)(xs)
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.asarray(xs))

    with mesh_context(Mesh(devs.reshape(2, 4), ("chains", "mesh"))):
        out = map_chains(fn, 4)(xs)
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.asarray(xs))
