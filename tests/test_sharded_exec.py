"""Sharded execution of the PRODUCTION model: `FieldLevelModel.logpdf`
under `parallel.context.mesh_context` must equal the single-device value.

This is the exact-parity counterpart of the hand-decomposed
`ShardedFieldLevelModel`: the same model code runs with the 3-D FFTs routed
through pencil shard_map islands and everything else partitioned by GSPMD,
so light-cone scale factors, curved-sky LOS, AP, survey selection, radial
counts, and every likelihood family shard by construction.
"""
import numpy as np
import pytest
import jax
from jax import numpy as jnp, random as jr
from jax.sharding import Mesh

from montecosmo_tpu import FieldLevelModel, default_config
from montecosmo_tpu.parallel.context import mesh_context

BASE = dict(default_config)
BASE.update(final_shape=(16, 16, 16), cell_length=40.0,
            init_oversamp=1.0, evol_oversamp=1.0, ptcl_oversamp=1.0,
            paint_oversamp=1.0, n_rbins=2)

CASES = {
    # the flagship physics: LPT + light-cone + curved sky + AP-auto +
    # quad-Gaussian likelihood + kaiser preconditioning + k-cut
    "flagship_lightcone": dict(
        evolution="lpt", a_obs=None, curved_sky=True,
        box_center=(0.0, 0.0, 1500.0), ap_auto=True,
        lik_type="quad_gauss", precond="kaiser"),
    "kaiser_flat_poisson": dict(
        evolution="kaiser", a_obs=0.5, curved_sky=False,
        box_center=(0.0, 0.0, 1000.0), lik_type="poisson", precond="real"),
    "nbody_fixed_a": dict(
        evolution="nbody", nbody_n_steps=2, a_obs=0.5, curved_sky=False,
        box_center=(0.0, 0.0, 1000.0), lik_type="quad_gauss",
        precond="kaiser"),
}


def make(**kw):
    conf = dict(BASE)
    conf.update(kw)
    return FieldLevelModel(**conf)


def fiducial_params(model, seed=0):
    params = model.reparam(dict(model.fiduc), inv=True)
    params["white_mesh_"] = jr.normal(jr.key(seed), model.init_shape)
    pred = model.predict(seed=seed + 1, samples=params, hide_base=False,
                         hide_det=False, hide_samp=False)
    params["count_mesh"] = pred["count_mesh"]
    return model.reparam(dict(model.fiduc), inv=True) | {
        "white_mesh_": params["white_mesh_"],
        "count_mesh": pred["count_mesh"]}


def spatial_mesh():
    return Mesh(np.asarray(jax.devices()), ("mesh",))


@pytest.mark.parametrize("case", sorted(CASES))
def test_logpdf_parity(case):
    model = make(**CASES[case])
    params = fiducial_params(model)
    ref = float(jax.jit(model.logpdf)(params))
    assert np.isfinite(ref)
    with mesh_context(spatial_mesh()):
        val = float(jax.jit(model.logpdf)(params))
    np.testing.assert_allclose(val, ref, rtol=2e-4, atol=5e-3 + 2e-6 * abs(ref))


def test_grad_parity_flagship():
    """Reverse mode through the pencil islands matches the local gradient."""
    model = make(**CASES["flagship_lightcone"])
    params = fiducial_params(model)
    obs = {"count_mesh": params.pop("count_mesh")}

    def logp(p):
        return model.logpdf({**p, **obs})

    gref = jax.jit(jax.grad(logp))(params)
    with mesh_context(spatial_mesh()):
        gsh = jax.jit(jax.grad(logp))(params)
    for k in gref:
        a, b = np.asarray(gref[k]), np.asarray(gsh[k])
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-4,
                                   err_msg=k)


def test_predict_under_context():
    """The generative direction also runs decomposed (same seeds -> close
    fields; RNG is identical, only FFT roundoff differs)."""
    model = make(**CASES["flagship_lightcone"])
    params = model.reparam(dict(model.fiduc), inv=True)
    params["white_mesh_"] = jr.normal(jr.key(3), model.init_shape)
    ref = model.predict(seed=4, samples=params, hide_det=False)
    with mesh_context(spatial_mesh()):
        val = model.predict(seed=4, samples=params, hide_det=False)
    np.testing.assert_allclose(np.asarray(val["gxy_mesh"]),
                               np.asarray(ref["gxy_mesh"]),
                               rtol=2e-3, atol=2e-3)


def test_powspec_observable_parity():
    """The powspec likelihood (bincount multipole estimator + block-MVN)
    also runs decomposed under the mesh context."""
    model = make(evolution="lpt", a_obs=0.5, curved_sky=False,
                 box_center=(0.0, 0.0, 1500.0), lik_type="quad_gauss",
                 precond="kaiser", observable="powspec", poles=(0, 2))
    params = model.reparam(dict(model.fiduc), inv=True)
    params["white_mesh_"] = jr.normal(jr.key(5), model.init_shape)
    pred = model.predict(seed=6, samples=params, hide_base=False,
                         hide_det=False, hide_samp=False)
    params["powspec"] = pred["powspec"]

    ref = float(jax.jit(model.logpdf)(params))
    assert np.isfinite(ref)
    with mesh_context(spatial_mesh()):
        val = float(jax.jit(model.logpdf)(params))
    np.testing.assert_allclose(val, ref, rtol=2e-4, atol=5e-3 + 2e-6 * abs(ref))


def test_chains_by_mesh_single_program():
    """dp x sp: >1 chain AND >1 mesh shard run the production model in ONE
    jit — vmap's spmd_axis_name threads the chain axis through the pencil
    FFT / halo paint islands of the 2-D (chains x mesh) device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    model = make(**CASES["flagship_lightcone"])
    p0 = fiducial_params(model)
    obs = {"count_mesh": p0.pop("count_mesh")}

    def logp(p):
        return model.logpdf({**p, **obs})

    n_chains, n_mesh = 2, 4
    mesh2d = Mesh(np.asarray(jax.devices()).reshape(n_chains, n_mesh),
                  ("chains", "mesh"))
    batched = {k: jnp.broadcast_to(jnp.asarray(v), (n_chains, *jnp.shape(v)))
               for k, v in p0.items()}
    batched["white_mesh_"] = jnp.stack(
        [p0["white_mesh_"], -p0["white_mesh_"]])

    ref = [float(jax.jit(logp)({k: v[i] for k, v in batched.items()}))
           for i in range(n_chains)]

    with mesh_context(mesh2d):
        fn = jax.jit(jax.vmap(jax.value_and_grad(logp),
                              spmd_axis_name="chains"))
        sharded = {k: jax.device_put(v, NamedSharding(
            mesh2d, P("chains", *(None,) * (v.ndim - 1))))
            for k, v in batched.items()}
        val, grad = fn(sharded)
    np.testing.assert_allclose(np.asarray(val), np.asarray(ref),
                               rtol=2e-4, atol=5e-3)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grad.values())


def test_map_chains_dp_sp_under_context():
    """map_chains inside a 2-D mesh_context shards chains over 'chains' and
    runs the spatially decomposed model per chain (one program)."""
    from montecosmo_tpu.parallel.chains import map_chains

    model = make(**CASES["kaiser_flat_poisson"])
    p0 = fiducial_params(model)
    obs = {"count_mesh": p0.pop("count_mesh")}

    def logp(p):
        return model.logpdf({**p, **obs})

    n_chains = 2
    mesh2d = Mesh(np.asarray(jax.devices()).reshape(n_chains, -1),
                  ("chains", "mesh"))
    batched = {k: jnp.broadcast_to(jnp.asarray(v), (n_chains, *jnp.shape(v)))
               for k, v in p0.items()}
    ref = float(jax.jit(logp)(p0))
    with mesh_context(mesh2d):
        vals = map_chains(logp, n_chains)(batched)
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=2e-4,
                               atol=5e-3 + 2e-6 * abs(ref))
