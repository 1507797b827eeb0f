"""Nightly posterior-recovery integration test: a small self-predicted
campaign must recover (Omega_m, sigma8, b1) within wide credible bounds.

Mirrors the reference's end-to-end usage (run/infer.py 3-phase pipeline);
budgets sized for ~15 min on CPU.  Run with: pytest -m nightly.
"""
import numpy as np
import pytest
import jax
from jax import numpy as jnp, random as jr

from montecosmo_tpu import FieldLevelModel, default_config


@pytest.mark.nightly
def test_posterior_recovers_fiducial(tmp_path):
    from montecosmo_tpu.samplers.mclmc import get_mclmc_run, get_mclmc_warmup
    from montecosmo_tpu.parallel import map_chains

    conf = dict(default_config)
    conf.update(final_shape=(16, 16, 16), cell_length=25.0, evolution="lpt",
                lpt_order=1, a_obs=0.5, curved_sky=False,
                box_center=(0.0, 0.0, 1000.0), lik_type="quad_gauss",
                precond="kaiser", init_oversamp=1.0, evol_oversamp=1.0,
                ptcl_oversamp=1.0, paint_oversamp=1.0)
    model = FieldLevelModel(**conf)

    # self-predicted truth at the fiducial point
    truth = model.reparam(dict(model.fiduc), inv=True)
    truth["white_mesh_"] = jr.normal(jr.key(7), model.init_shape)
    pred = model.predict(seed=8, samples=truth, hide_base=False,
                        hide_det=False, hide_samp=False)
    model.count_mesh = pred["count_mesh"]
    model.substitute({"count_mesh": pred["count_mesh"]})
    model.block()

    n_chains = 2
    start = jax.jit(jax.vmap(model.kaiser_post))(jr.split(jr.key(9), n_chains))

    warm = map_chains(get_mclmc_warmup(model.logpdf, n_steps=300,
                                       desired_energy_var=1e-5,
                                       diagonal_preconditioning=True),
                      n_chains)
    state, config = warm(jr.split(jr.key(10), n_chains), start)

    run = map_chains(get_mclmc_run(model.logpdf, n_samples=96, thinning=8,
                                   progress_bar=False), n_chains)
    state, samples = run(jr.split(jr.key(11), n_chains), state, config)

    for name in ("Omega_m", "sigma8", "b1"):
        x = np.asarray(samples[name + "_"]).reshape(-1)
        x = np.asarray(jax.vmap(
            lambda v, n=name: model.reparam({n + "_": v})[n])(jnp.asarray(x)))
        true_val = float(np.asarray(model.fiduc[name]))
        lo, hi = np.quantile(x, [0.005, 0.995])
        width = hi - lo
        assert lo - 0.5 * width <= true_val <= hi + 0.5 * width, (
            f"{name}: truth {true_val} outside [{lo}, {hi}] (+50% margin)")
        assert np.isfinite(x).all()
