"""Host-driven NUTS warmup + run == the monolithic in-program versions.

MONTECOSMO_NUTS_EVALS_PER_PROGRAM re-routes _segmented_nuts_warmup and
full_run's NUTS runner through nuts_host_transition; the key schedules are
constructed identically, so the trajectories must match exactly.
"""
import os

import numpy as np
import jax
from jax import numpy as jnp, random as jr

from montecosmo_tpu.script import _make_nuts_host_runner, _segmented_nuts_warmup
from montecosmo_tpu.samplers.hmc import hmc_init


def _logpdf(v):
    lp = 0.0
    for k, x in v.items():
        sc = 2.0 if k.endswith("mesh_") else 0.5
        lp += -0.5 * jnp.sum((x / sc) ** 2) - 0.05 * jnp.sum(x**4)
    return lp


def _pos(n_chains):
    k1, k2 = jr.split(jr.key(7))
    return {"white_mesh_": 0.3 * jr.normal(k1, (n_chains, 8)),
            "b1_": 0.3 * jr.normal(k2, (n_chains,))}


def test_host_warmup_matches_chunked(monkeypatch):
    n_chains = 2
    pos = _pos(n_chains)

    monkeypatch.delenv("MONTECOSMO_NUTS_EVALS_PER_PROGRAM", raising=False)
    s_ref, c_ref, n_ref = _segmented_nuts_warmup(
        _logpdf, 32, n_chains, jr.key(3), pos)

    monkeypatch.setenv("MONTECOSMO_NUTS_EVALS_PER_PROGRAM", "4")
    s_got, c_got, n_got = _segmented_nuts_warmup(
        _logpdf, 32, n_chains, jr.key(3), pos)

    assert n_got == n_ref
    for name in s_ref:
        np.testing.assert_allclose(
            np.asarray(_flat(s_got[name].position)),
            np.asarray(_flat(s_ref[name].position)), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(c_got[name]["step_size"]),
                                   np.asarray(c_ref[name]["step_size"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(c_got[name]["inverse_mass_matrix"]),
            np.asarray(c_ref[name]["inverse_mass_matrix"]), rtol=1e-6)


def _flat(tree):
    return jnp.concatenate([jnp.ravel(x) for _, x in sorted(tree.items())],
                           axis=-1)


def test_host_runner_matches_monolithic():
    from montecosmo_tpu.samplers import nutswg_init
    from montecosmo_tpu.samplers.hmc import sampling_loop_general

    n_chains, seg = 2, 3
    pos = _pos(n_chains)
    blocks = {"mesh_": ["white_mesh_"], "rest_": ["b1_"]}

    def binit(p, other):
        return hmc_init(p, lambda v: _logpdf({**other, **v}))

    st = {}
    for name, keys in blocks.items():
        p = {k: pos[k] for k in keys}
        o = {k: pos[k] for k in pos if k not in keys}
        st[name] = jax.jit(jax.vmap(binit))(p, o)

    d_mesh, d_rest = 8, 1
    config = {
        "mesh_": {"step_size": jnp.full((n_chains,), 0.3),
                  "inverse_mass_matrix": jnp.ones((n_chains, d_mesh))},
        "rest_": {"step_size": jnp.full((n_chains,), 0.3),
                  "inverse_mass_matrix": jnp.ones((n_chains, d_rest))},
    }

    # monolithic reference (full_run's default runner)
    step_fn, init_fn, _, _ = nutswg_init(_logpdf)

    def sweep(sd, s, cf):
        s, (union, infos) = sampling_loop_general(
            sd, s, _logpdf, step_fn, init_fn, cf, seg)
        return s, {**union, "logdensity": infos["logdensity"],
                   "n_evals": infos["n_evals"]}

    ref_state, ref_part = jax.jit(jax.vmap(sweep))(
        jr.split(jr.key(11), n_chains), st, config)

    runner = _make_nuts_host_runner(_logpdf, config, n_chains, seg, host_m=4)
    got_state, got_part = runner(jr.key(11), st)

    for k in ref_part:
        np.testing.assert_allclose(np.asarray(got_part[k]),
                                   np.asarray(ref_part[k]), rtol=1e-5,
                                   err_msg=k)
    for name in ref_state:
        np.testing.assert_allclose(
            np.asarray(_flat(got_state[name].position)),
            np.asarray(_flat(ref_state[name].position)), rtol=1e-5)
