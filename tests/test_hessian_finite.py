"""Second-order differentiability of the full model (round-5 regression).

Forward-over-reverse HVPs of the joint logpdf w.r.t. the cosmological
scalars must be finite: the NUTS Laplace mass seed (script._laplace_seed)
builds the warm-start Hessian this way, and without it the first windows
burn 126-eval max-depth trees (measured, nuts32r5 try 1).

Root cause fixed here-at-test: `pmesh**0.5` in white2lin on a power mesh
with EXACT zeros (DC/below-table entries masked to 0.0 by the interp) has
an infinite-slope vjp at those entries; re-linearizing the vjp turns
inf * (zero tangent) into NaN — value and FIRST gradient are finite, every
SECOND derivative is NaN (utils.safe.safe_sqrt, the double-where pattern).
"""
import numpy as np
import pytest

import jax
import jax.flatten_util
from jax import numpy as jnp, random as jr

from montecosmo_tpu import FieldLevelModel, default_config


@pytest.mark.parametrize("evolution", ["kaiser", "lpt"])
def test_scalar_hessian_finite(evolution):
    conf = dict(default_config)
    conf.update(final_shape=3 * (8,), cell_length=40.0, evolution=evolution,
                lpt_order=2, a_obs=0.5, curved_sky=False,
                box_center=(0.0, 0.0, 1000.0), lik_type="quad_gauss",
                precond="kaiser", init_oversamp=1.0, evol_oversamp=1.0,
                ptcl_oversamp=1.0, paint_oversamp=1.0)
    model = FieldLevelModel(**conf)

    truth = model.reparam(dict(model.fiduc), inv=True)
    truth["white_mesh_"] = jr.normal(jr.key(7), model.init_shape)
    pred = model.predict(seed=8, samples=truth, hide_base=False,
                         hide_det=False, hide_samp=False)
    obs = {"count_mesh": pred["count_mesh"],
           "white_mesh_": truth["white_mesh_"]}

    p0 = {k: jnp.zeros(()) for k in ("Omega_m_", "b1_", "sigma8_")}
    flat0, unravel = jax.flatten_util.ravel_pytree(p0)

    def lp(flat):
        return model.logpdf({**obs, **unravel(flat)})

    g = np.asarray(jax.jit(jax.grad(lp))(flat0))
    assert np.isfinite(g).all(), g

    gfn = jax.grad(lp)
    hvp = jax.jit(lambda v: jax.jvp(gfn, (flat0,), (v,))[1])
    cols = np.stack([np.asarray(hvp(jnp.zeros_like(flat0).at[i].set(1.0)))
                     for i in range(flat0.shape[0])])
    assert np.isfinite(cols).all(), cols
    # a Hessian, not zeros: curvature must actually flow through the model
    assert np.abs(cols).max() > 1e-3, cols
