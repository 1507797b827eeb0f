"""Chunked run-and-save driver: npz dumps + pickled resume state."""
import numpy as np
from jax import numpy as jnp, random as jr

from montecosmo_tpu.samplers import (
    hmc_init, nuts_kernel, sample_and_save, save_run,
)
import jax


def test_sample_and_save_resume(tmp_path):
    logdf = lambda p: -0.5 * jnp.sum(p["x"] ** 2)
    kernel = nuts_kernel(logdf, step_size=0.5, inverse_mass_matrix=jnp.ones(3))

    def run_fn(seed, state):
        def step(state, key):
            state, info = kernel(key, state)
            return state, (state.position["x"], info["acceptance_rate"],
                           info["num_integration_steps"])
        state, (xs, accs, nint) = jax.lax.scan(step, state, jr.split(seed, 20))
        return {"x": xs}, {"acceptance_rate": accs, "n_evals": nint.sum()}, state

    path = str(tmp_path / "mcmc")
    state0 = hmc_init({"x": jnp.zeros(3)}, logdf)
    state = sample_and_save(run_fn, state0, path, start=1, end=2, seed=0)

    d = np.load(path + "_1.npz")
    assert d["x"].shape == (20, 3)
    assert np.all(np.isfinite(d["x"]))
    assert (tmp_path / "mcmc_last_state.p").exists()

    # resume: run 3 only
    state = sample_and_save(run_fn, state0, path, start=1, end=3, seed=0)
    assert (tmp_path / "mcmc_3.npz").exists()
