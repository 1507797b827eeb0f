"""End-to-end pipeline: catalog registration -> model-from-register ->
3-phase inference -> chain loading.

Hermetic version of the reference's `tests/test_register.py` and the
run/infer.py campaign flow, on a tiny synthetic full-sky mock.
"""
import numpy as np
import pytest
import jax
from jax import numpy as jnp, random as jr

from montecosmo_tpu import FieldLevelModel, default_config
from montecosmo_tpu.models.bricks import white_noise
from montecosmo_tpu.ops.background import AbacusSummit0, Background
from montecosmo_tpu.ops.power import lin_power
from montecosmo_tpu.utils.io import h5load, h5save

FINAL = 8
BOX = 320.0


@pytest.fixture(scope="module")
def register_path(tmp_path_factory):
    """Register a synthetic full-sky particle catalog."""
    rng = np.random.default_rng(0)
    cosmo_fid = AbacusSummit0()
    n_part = 6000
    pos = rng.uniform(0, BOX, size=(n_part, 3))
    vel = rng.normal(0, 100.0, size=(n_part, 3))  # km/s peculiar
    data = {"pos": pos, "vel": vel}

    reg = FieldLevelModel.register_catalog(
        cell_budget=FINAL**3, cosmo_fid=cosmo_fid, data=data,
        a_obs=0.5, los=(0.0, 0.0, 1.0), box_size=np.full(3, BOX),
        box_center=(0.0, 0.0, 0.0), init_oversamp=1.0, paint_oversamp=1.0)

    # init block: tabulated linear power (normalized to sigma8=1) + fake ICs
    ks, pows = lin_power(cosmo_fid._replace(sigma8=1.0))
    reg["lin_kpow"] = np.stack([np.asarray(ks), np.asarray(pows)])
    white = white_noise(42, (FINAL, FINAL, FINAL), np.full(3, BOX))
    reg["white_fake"] = np.asarray(white)

    path = tmp_path_factory.mktemp("reg") / "register_test.h5"
    h5save(path, reg)
    return path


def test_register_contents(register_path):
    reg = h5load(register_path)
    assert reg["count_mesh"].shape == (FINAL, FINAL, FINAL)
    np.testing.assert_allclose(reg["count_mesh"].sum(), reg["n_tracers"], rtol=1e-3)
    assert reg["curved_sky"] is False or reg["curved_sky"] == 0


@pytest.fixture(scope="module")
def model(register_path):
    conf = dict(default_config)
    conf.update(evolution="kaiser", lik_type="quad_gauss", register=str(register_path),
                n_rbins=1, evol_oversamp=1.0, ptcl_oversamp=1.0)
    return FieldLevelModel(**conf)


def test_model_from_register(model):
    assert model.final_shape == (FINAL, FINAL, FINAL)
    assert model.count_mesh is not None
    # ngbar fiducial set from the registered counts
    ngbar = float(np.mean(model.fiduc["ngbars"]))
    np.testing.assert_allclose(ngbar, 6000 / BOX**3, rtol=1e-2)
    # lin_kpow loaded
    assert model.lin_kpow is not None


def test_self_data_and_fiducial_logpdf(model):
    """The reference's fiducial sanity check (run/infer.py:145-157)."""
    pred = model.predict(samples=model.fiduc | {"white_mesh": model.white_mesh},
                         hide_base=False, hide_samp=False, from_base=True)
    model.count_mesh = pred["count_mesh"]
    lp = model.logpdf(model.reparam(
        model.fiduc | {"white_mesh": model.white_mesh,
                       "count_mesh": model.count_mesh}, inv=True))
    assert np.isfinite(float(lp)), lp


def test_three_phase_inference(model, tmp_path):
    """field_warmup -> full_warmup -> full_run -> load_runs, smoke-scale."""
    from montecosmo_tpu.script import field_warmup, full_run, full_warmup

    chains_dir = tmp_path / "chains"
    n_chains = 2

    # synthetic observations at fiducial
    pred = model.predict(samples=model.fiduc | {"white_mesh": model.white_mesh},
                         hide_base=False, hide_samp=False, from_base=True)
    model.count_mesh = pred["count_mesh"]

    state, config, params_start = field_warmup(
        model, chains_dir, n_steps=64, desired_energy_var=1e-4,
        n_chains=n_chains, seed=1)
    assert np.all(np.isfinite(np.asarray(config.step_size)))

    obs = {k: (model.fiduc | {"count_mesh": model.count_mesh})[k]
           for k in ("count_mesh", "alpha_iso", "alpha_ap", "b2", "bs2", "b3",
                     "bds2", "bs3", "bn2", "bnpar", "fNL", "fNL_bp", "fNL_bpd",
                     "fNL_bpd2", "fNL_bps2", "fNL_bn2p", "s_k2e", "s_kmu2e",
                     "s_ed", "s_e2", "s_ep", "ngbars")}
    state, config = full_warmup(model, obs, state, chains_dir, n_steps=64,
                                desired_energy_var=1e-4, n_chains=n_chains,
                                tune_mass=False, seed=2)

    state = full_run(model, state, config, chains_dir, n_samples=4, n_runs=2,
                     n_chains=n_chains, thinning=2, seed=3)

    chains = model.load_runs(chains_dir, 1, 2)
    # 2 chains x (2 runs x 4 samples)
    assert np.asarray(chains.data["Omega_m_"]).shape == (n_chains, 8)
    assert np.all(np.isfinite(np.asarray(chains.data["logdensity"])))

    # resume logic: a third run resumes at run 3
    state = full_run(model, state, config, chains_dir, n_samples=4, n_runs=3,
                     n_chains=n_chains, thinning=2, seed=3)
    chains = model.load_runs(chains_dir, 1, 3)
    assert np.asarray(chains.data["Omega_m_"]).shape == (n_chains, 12)

    # reparametrize chains into base space
    base = model.reparam_chains(chains[["Omega_m_", "sigma8_", "b1_", "s_e_"]])
    assert "Omega_m" in base.data
    assert np.all(np.isfinite(np.asarray(base.data["Omega_m"])))
