"""ShardedFieldLevelModel: the pod-scale model API runs decomposed end-to-end
(predict -> logpdf/force -> MCLMC) on the 8-device mesh."""
import numpy as np
import jax
from jax import numpy as jnp, random as jr
from jax.sharding import Mesh

from montecosmo_tpu.parallel import ShardedFieldLevelModel

SHAPE = (32, 16, 16)
BOX = (400.0, 200.0, 200.0)


def make_model(**kw):
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))
    conf = dict(mesh_shape=SHAPE, box_size=BOX, a_obs=0.5, device_mesh=mesh,
                bias=dict(b1=1.0, b2=0.3), rsd=True, lpt_order=1,
                noise_std=0.5, halo=4)
    conf.update(kw)
    return ShardedFieldLevelModel(**conf)


def test_predict_is_sharded_and_sane():
    model = make_model()
    truth = model.predict(seed=0)
    for k in ("white_mesh", "mean_mesh", "obs_mesh"):
        arr = truth[k]
        assert arr.shape == SHAPE
        assert len(arr.sharding.device_set) == 8, k
        assert bool(jnp.all(jnp.isfinite(arr))), k
    # mean field conserves mass (weights average to 1 by renormalization)
    assert abs(float(truth["mean_mesh"].mean()) - 1.0) < 0.05
    # noise actually added
    assert float(jnp.abs(truth["obs_mesh"] - truth["mean_mesh"]).std()) > 0.1


def test_truth_scores_higher_than_prior_draw():
    model = make_model()
    truth = model.predict(seed=0)
    lp_truth = float(model.logpdf(truth["white_mesh"], truth["obs_mesh"]))
    other = model.sample_white(seed=7)
    lp_other = float(model.logpdf(other, truth["obs_mesh"]))
    assert np.isfinite(lp_truth) and np.isfinite(lp_other)
    assert lp_truth > lp_other


def test_potential_and_force():
    model = make_model()
    truth = model.predict(seed=1)
    pot, force = model.potential_and_force(truth["white_mesh"],
                                           truth["obs_mesh"])
    assert np.isfinite(float(pot))
    assert force.shape == SHAPE
    assert len(force.sharding.device_set) == 8
    assert bool(jnp.all(jnp.isfinite(force)))
    # gradient is non-trivial
    assert float(jnp.abs(force).max()) > 1e-3


def test_selection_masks_likelihood():
    """Voxels with selection 0 contribute nothing: garbage observations in
    the masked region leave the logpdf unchanged."""
    sel = np.ones(SHAPE, np.float32)
    sel[:, :, :4] = 0.0  # mask a z-slab (unsharded axis, same on every shard)
    model = make_model(selection=sel)
    truth = model.predict(seed=0)
    obs = truth["obs_mesh"]
    # obs is already zeroed where sel == 0
    assert float(jnp.abs(obs[:, :, :4]).max()) == 0.0
    lp = float(model.logpdf(truth["white_mesh"], obs))
    garbage = obs.at[:, :, :4].set(1e3)
    lp_garbage = float(model.logpdf(truth["white_mesh"],
                                    model.shard(garbage)))
    assert np.isfinite(lp)
    np.testing.assert_allclose(lp_garbage, lp, rtol=1e-6)


def test_poisson_likelihood_end_to_end():
    model = make_model(lik_type="poisson", ngbar=10.0, noise_std=0.0)
    truth = model.predict(seed=4)
    counts = truth["obs_mesh"]
    assert float(counts.min()) >= 0
    assert np.allclose(np.asarray(counts), np.round(np.asarray(counts)))
    # mean count ~ ngbar (density averages to 1)
    assert abs(float(counts.mean()) - 10.0) < 1.0

    lp_truth = float(model.logpdf(truth["white_mesh"], counts))
    lp_other = float(model.logpdf(model.sample_white(seed=9), counts))
    assert np.isfinite(lp_truth) and lp_truth > lp_other

    pot, force = model.potential_and_force(truth["white_mesh"], counts)
    assert np.isfinite(float(pot))
    assert bool(jnp.all(jnp.isfinite(force)))
    assert len(force.sharding.device_set) == 8


def test_sharded_spectrum_matches_single_device():
    from montecosmo_tpu.metrics import spectrum
    from montecosmo_tpu.parallel.metrics import sharded_spectrum

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)

    k_ref, p_ref = spectrum(x, box_size=np.asarray(BOX))
    k_got, p_got = sharded_spectrum(x, BOX, mesh)

    np.testing.assert_allclose(k_got, np.asarray(k_ref), rtol=1e-5)
    np.testing.assert_allclose(p_got, np.asarray(p_ref), rtol=1e-4)


def test_mclmc_through_model_api():
    from montecosmo_tpu.samplers import get_mclmc_run, mclmc_init
    from montecosmo_tpu.samplers.mclmc import MCLMCAdaptationState

    model = make_model()
    truth = model.predict(seed=2)
    logdf = model.logdf_fn(truth["obs_mesh"])

    params = {"white_mesh": model.sample_white(seed=3)}
    state = mclmc_init(params, logdf, jr.key(0))
    d = int(np.prod(SHAPE))
    config = MCLMCAdaptationState(L=jnp.sqrt(float(d)), step_size=0.05,
                                  inverse_mass_matrix=1.0)
    state, samples = get_mclmc_run(logdf, n_samples=4, thinning=1)(
        jr.key(1), state, config)
    assert np.all(np.isfinite(np.asarray(samples["logdensity"])))
    assert len(state.position["white_mesh"].sharding.device_set) == 8


def test_sharded_stoch_likelihood_families():
    """quad_gauss / two_quad_gauss / shash on the sharded path: finite
    logpdf + end-to-end gradient."""
    for lik in ("quad_gauss", "two_quad_gauss", "shash"):
        m = make_model(lik_type=lik, ngbar=4.0,
                       stoch={"s_e": 1.0, "s_e2": 0.02})
        pred = m.predict(seed=0)
        assert np.all(np.isfinite(np.asarray(pred["obs_mesh"]))), lik
        lp, force = m.potential_and_force(pred["white_mesh"],
                                          pred["obs_mesh"])
        assert np.isfinite(float(lp)), lik
        assert np.all(np.isfinite(np.asarray(force))), lik


def test_sharded_ap_param():
    """Flat-sky parametric AP distorts the observable and keeps logpdf +
    force finite; alpha=1 is a no-op."""
    m_id = make_model(ap={"alpha_iso": 1.0, "alpha_ap": 1.0})
    m_no = make_model()
    m_ap = make_model(ap={"alpha_iso": 1.02, "alpha_ap": 0.98})

    w = m_no.sample_white(seed=3)
    d_id = np.asarray(m_id.observable(w))
    d_no = np.asarray(m_no.observable(w))
    d_ap = np.asarray(m_ap.observable(w))
    np.testing.assert_allclose(d_id, d_no, rtol=1e-5, atol=1e-5)
    assert np.abs(d_ap - d_no).max() > 1e-3  # AP actually moved mass

    pred = m_ap.predict(seed=4)
    lp, force = m_ap.potential_and_force(pred["white_mesh"], pred["obs_mesh"])
    assert np.isfinite(float(lp)) and np.all(np.isfinite(np.asarray(force)))
