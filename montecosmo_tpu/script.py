"""Inference orchestration: the 3-phase field-level pipeline with file-based
idempotent resume.

Phase 1 `field_warmup`  : sample only the initial field (all other latents at
                          fiducial), chains started from the analytic Kaiser
                          posterior, MCLMC-tuned per chain.
Phase 2 `full_warmup`   : tune every latent, seeding the field from phase 1;
                          tuned configs collapse to one shared median config
                          with L set from the evals/ESS target.
Phase 3 `full_run`      : n_runs x n_samples thinned MCLMC samples, each run
                          saved as run_{i}.h5 + a resumable last state.

Every phase checks for its outputs and loads instead of recomputing — crash
recovery is file-based resume, with the RNG key advanced per completed run.

Parity: reference `montecosmo/script.py` (map_chains:13-20, field_warmup:
32-68, full_warmup:109-153, full_run:156-191, make_chains:197-306,
make_logdf_mesh:309-345, compare_chains:349-403).
"""
import os
from functools import partial
from pathlib import Path

import numpy as np
import jax
import jax.flatten_util
from jax import jit, numpy as jnp, random as jr, vmap

from montecosmo_tpu.parallel.chains import map_chains
from montecosmo_tpu.samplers import (
    IntegratorState, MCLMCAdaptationState, get_mclmc_run, get_mclmc_warmup,
)
from montecosmo_tpu.samplers.mclmc import (
    MCLMCAdaptationState as _AdaptState, _warmup_carry0, _warmup_chunk,
    _warmup_finalize, mclmc_init,
)
from montecosmo_tpu.utils.io import h5load, h5load_tree, h5save, h5save_tree
from montecosmo_tpu.utils.profiling import phase

# The axon TPU tunnel kills device programs that run longer than ~30-60 s
# ("TPU worker process crashed", kernel fault). Long scans are therefore
# CHUNKED at the host level into programs of at most this many MCLMC steps
# (0 = unchunked). Warmup segments re-enter the tuner with the carried
# config; run chunks carry the integrator state exactly.
MAX_STEPS_PER_CALL = int(os.environ.get("MONTECOSMO_MAX_STEPS_PER_CALL", 128))


def _segmented_warmup(logpdf, n_steps, desired_energy_var, tune_mass,
                      n_chains, key, pos):
    """MCLMC warmup chunked into <= MAX_STEPS_PER_CALL-step device programs.

    The adaptation carry is threaded across chunks, so the tuning trajectory
    is IDENTICAL to one monolithic warmup (same per-step keys): only the
    host/device dispatch boundary moves — required on the axon runtime,
    which kills device programs running longer than ~30-60 s.
    """
    if not MAX_STEPS_PER_CALL or n_steps <= MAX_STEPS_PER_CALL:
        fn = map_chains(get_mclmc_warmup(
            logpdf, n_steps=n_steps, config=None,
            desired_energy_var=desired_energy_var,
            diagonal_preconditioning=tune_mass), n_chains)
        return fn(jr.split(key, n_chains), pos)

    steps1 = n_steps // 2
    steps2 = n_steps - steps1

    def prep_keys(seed):  # mirrors mclmc_warmup's key bookkeeping exactly
        init_seed, tune_seed = jr.split(seed, 2)
        k1, k2 = jr.split(tune_seed)
        return init_seed, jr.split(k1, steps1), jr.split(k2, steps2)

    seeds = jr.split(key, n_chains)
    init_seeds, keys1, keys2 = jit(vmap(prep_keys))(seeds)

    def init_carry(init_seed, p):
        state = mclmc_init(p, logpdf, init_seed)
        flat = jax.flatten_util.ravel_pytree(state.position)[0]
        d = flat.shape[0]
        config = _AdaptState(jnp.asarray(d**0.5, flat.dtype),
                             jnp.asarray(d**0.5 / 1e4, flat.dtype),
                             inverse_mass_matrix=jnp.ones(d, flat.dtype))
        return _warmup_carry0(state, config, flat.dtype, d)

    carry = jit(vmap(init_carry))(init_seeds, pos)
    chunk1 = jit(vmap(partial(_warmup_chunk, stream_moments=False,
                              logdf=logpdf,
                              desired_energy_var=desired_energy_var)))
    chunk2 = jit(vmap(partial(_warmup_chunk, stream_moments=True,
                              logdf=logpdf,
                              desired_energy_var=desired_energy_var)))
    i = 0
    for seg in _segments(steps1, MAX_STEPS_PER_CALL):
        carry = chunk1(carry, keys=keys1[:, i:i + seg])
        i += seg
    i = 0
    for seg in _segments(steps2, MAX_STEPS_PER_CALL):
        carry = chunk2(carry, keys=keys2[:, i:i + seg])
        i += seg
    return jit(vmap(partial(_warmup_finalize,
                            diagonal_preconditioning=tune_mass)))(carry)


def _segments(n_steps, max_steps):
    if not max_steps or n_steps <= max_steps:
        return [n_steps]
    n_seg = -(-n_steps // max_steps)
    base = n_steps // n_seg
    sizes = [base] * n_seg
    for i in range(n_steps - base * n_seg):
        sizes[i] += 1
    return sizes


def field_warmup(model, chains_dir, n_steps, desired_energy_var, n_chains,
                 scale_field=7 / 8, seed=43, overwrite=False):
    """Field-only warmup: fix every latent to fiducial, condition on the
    observed counts, tune MCLMC on the initial field.

    Returns (state, config, params_start); the model is left conditioned.
    """
    chains_dir = Path(chains_dir)
    chains_dir.mkdir(parents=True, exist_ok=True)
    state_path = chains_dir / "field_warm_state.h5"
    conf_path = chains_dir / "field_warm_conf.h5"

    model.reset()
    model.substitute(model.fiduc | {"count_mesh": model.count_mesh}, from_base=True)
    model.block()

    params_start = jit(vmap(partial(model.kaiser_post, scale_field=scale_field)))(
        jr.split(jr.key(45), n_chains))
    print("\nField warmup params:", list(params_start))

    if not state_path.exists() or overwrite:
        print("Field warmup...")
        with phase("field_warmup"):
            state, config = _segmented_warmup(
                model.logpdf, n_steps, desired_energy_var, False, n_chains,
                jr.key(seed), params_start)
        h5save_tree(state_path, state)
        h5save_tree(conf_path, config)
    else:
        print("Loading field warmup...")
        state = h5load_tree(state_path, IntegratorState)
        config = h5load_tree(conf_path, MCLMCAdaptationState)
    return state, config, params_start


def plot_field_warmup(model, params_start, state, save_dir, prob=(0.68, 0.95)):
    """Power/transfer/coherence of the warmup chains vs the true ICs."""
    import matplotlib.pyplot as plt
    from montecosmo_tpu.plot import plot_pow, plot_powtranscoh, plot_trans

    save_dir = Path(save_dir)
    white_mesh = model.white_mesh
    kptcs_start = vmap(lambda x: model.powtranscoh(
        white_mesh, model.reparam(x)["white_mesh"]))(params_start)
    kptcs_warm = vmap(lambda x: model.powtranscoh(
        white_mesh, model.reparam(x)["white_mesh"]))(state.position)
    kpow_true = model.spectrum(white_mesh)
    # whitened ICs -> the theoretical reference is flat unit power
    kpow_fid = kptcs_warm[0][0], jnp.ones_like(kptcs_warm[0][0])

    plt.figure(figsize=(12, 4), layout="constrained")

    def plot_kptcs(kptcs, label=None):
        plot_powtranscoh(*kptcs, fill=prob)
        plot_powtranscoh(*jax.tree.map(lambda x: jnp.median(x, 0), kptcs),
                         label=label)

    plot_kptcs(kptcs_start, label="start")
    plot_kptcs(kptcs_warm, label="warm")

    plt.subplot(131)
    plot_pow(*kpow_true, "k:", label="true")
    plot_pow(*kpow_fid, "k--", alpha=0.5, label="fiducial")
    plt.legend()
    plt.subplot(132)
    plt.axhline(1.0, linestyle=":", color="k", alpha=0.5)
    plot_trans(kpow_true[0], (kpow_fid[1] / kpow_true[1]) ** 0.5, "k--",
               alpha=0.5, label="fiducial")
    plt.subplot(133)
    plt.axhline(float(np.mean(np.asarray(model.selec_mesh))), linestyle=":",
                color="k", alpha=0.5)
    plt.savefig(save_dir / "field_warm.png", dpi=300)
    plt.close()


def full_warmup(model, obs, state_field, chains_dir, n_steps, desired_energy_var,
                n_chains, tune_mass, eval_per_ess=1e3, seed=43, overwrite=False):
    """Full warmup: condition on `obs`, tune every other latent, seed the
    field from the field-warmup state.  Tuned configs collapse to the shared
    median config with L = 0.4 * (eval_per_ess / 2) * step_size."""
    chains_dir = Path(chains_dir)
    chains_dir.mkdir(parents=True, exist_ok=True)
    state_path = chains_dir / "full_warm_state.h5"
    conf_path = chains_dir / "full_warm_conf.h5"

    model.reset()
    model.substitute(obs | {"count_mesh": model.count_mesh}, from_base=True)
    model.block()

    if not state_path.exists() or overwrite:
        print("\nFull warmup...")
        params_warm = jit(vmap(model.kaiser_post))(jr.split(jr.key(45), n_chains))
        if "white_mesh" not in model.data:
            params_warm |= state_field.position
        print("Full warmup params:", list(params_warm))

        with phase("full_warmup"):
            state, config = _segmented_warmup(
                model.logpdf, n_steps, desired_energy_var, tune_mass,
                n_chains, jr.key(seed), params_warm)
        print_mclmc_config(config, state)

        ss = jnp.median(config.step_size)
        invmm = config.inverse_mass_matrix
        invmm = jnp.median(invmm, 0) if jnp.ndim(invmm) > 1 else jnp.median(invmm)
        config = MCLMCAdaptationState(L=0.4 * eval_per_ess / 2 * ss, step_size=ss,
                                      inverse_mass_matrix=invmm)
        config = jax.tree.map(
            lambda x: np.broadcast_to(np.asarray(x), (n_chains, *np.shape(x))),
            config)
        print_mclmc_config(config, state)

        h5save_tree(state_path, state)
        h5save_tree(conf_path, config)
    else:
        print("\nLoading full warmup...")
        state = h5load_tree(state_path, IntegratorState)
        config = h5load_tree(conf_path, MCLMCAdaptationState)
    return state, config


def full_run(model, state, config, chains_dir, n_samples, n_runs, n_chains,
             thinning=64, seed=42, overwrite=False):
    """Sampling runs with per-run HDF5 saves and last-state resume."""
    chains_dir = Path(chains_dir)
    chains_dir.mkdir(parents=True, exist_ok=True)
    last_path = chains_dir / "run_last_state.h5"

    start = 1
    if last_path.exists() and not overwrite:
        state = h5load_tree(last_path, IntegratorState)
        while (chains_dir / f"run_{start}.h5").exists() and start <= n_runs:
            start += 1
        print(f"Resuming at run {start}...")

    print("Running...")
    max_samp = max(1, MAX_STEPS_PER_CALL // max(1, thinning)) \
        if MAX_STEPS_PER_CALL else n_samples
    key = jr.key(seed)
    for _ in range(1, start):  # fresh randomness for resumed runs
        key, _ = jr.split(key, 2)

    for i_run in range(start, n_runs + 1):
        print(f"run {i_run}/{n_runs}")
        key, run_key = jr.split(key, 2)
        with phase("full_run"):
            chunks = []
            for seg in _segments(n_samples, max_samp):
                run_fn = map_chains(get_mclmc_run(
                    model.logpdf, seg, thinning=thinning,
                    progress_bar=False), n_chains)
                run_key, k = jr.split(run_key)
                state, part = run_fn(jr.split(k, n_chains), state, config)
                chunks.append(part)
            samples = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=1), *chunks) \
                if len(chunks) > 1 else chunks[0]

        print("MSE per dim:", np.asarray(jnp.mean(samples["mse_per_dim"], 1)), "\n")
        h5save(chains_dir / f"run_{i_run}.h5",
               {k: _to_savable(v) for k, v in samples.items()})
        h5save_tree(last_path, state)
    return state


def _to_savable(v):
    from montecosmo_tpu.utils.io import to_np
    return to_np(v)


# ---------------------------------------------------------------------------
# Chains post-processing
# ---------------------------------------------------------------------------
def make_chains(save_dir, start=1, end=100, thinning=1, reparb=False, prefix=""):
    """Load runs, reparametrize, compute field statistics, plot corner/trace
    panels, and save consolidated chain files."""
    import matplotlib.pyplot as plt
    from montecosmo_tpu.chains import Chains
    from montecosmo_tpu.models.model import FieldLevelModel
    from montecosmo_tpu.plot import (
        SetDark2, corner_plot, plot_coh, plot_pow, plot_powtranscoh, plot_trans,
    )
    from montecosmo_tpu.ops.hermitian import chreshape, r2chshape

    save_dir = Path(save_dir)
    chains_dir = save_dir / "chains"

    model = FieldLevelModel.load(save_dir / "model.yaml")
    obs = h5load(save_dir / "obs.h5")
    white_mesh = model.white_mesh
    infer_init = "white_mesh" not in obs
    markers = {k: float(v) for k, v in model.fiduc.items() if np.ndim(v) == 0}
    model.substitute(obs, from_base=True)

    transforms = [
        partial(Chains.thin, thinning=thinning),
        model.reparam_chains,
        partial(model.powtranscoh_chains,
                names="white_mesh" if infer_init else [], mesh0=white_mesh),
        partial(Chains.choice, n=10, names=["init", "init_"]),
    ]
    chains = model.load_runs(chains_dir, start, end, transforms=transforms,
                             batch_ndim=2)
    chains.save(chains_dir / f"{prefix}chains.h5")
    print(chains.shape, "\n")

    try:  # KDE can choke on degenerate samples; never kill postprocessing
        sel = chains.prune()[list(model.groups)
                             + (["~white_mesh"] if infer_init else [])]
        corner_plot(sel, markers=markers)
        plt.savefig(save_dir / f"{prefix}triangle.png", dpi=300)
        plt.close()
    except Exception as e:
        print(f"WARNING: triangle plot skipped ({type(e).__name__}: {e})")

    if infer_init:
        mesh_obs = jnp.fft.rfftn(model.count2delta(obs["count_mesh"]))
        mesh_obs = jnp.fft.irfftn(chreshape(mesh_obs, r2chshape(model.init_shape)))
        kptc_obs = model.powtranscoh(white_mesh, mesh_obs)
        kpow_ref = model.spectrum(white_mesh)
        kpow_fid = kptc_obs[0], jnp.ones_like(kptc_obs[0])

        plt.figure(figsize=(12, 4), layout="constrained")
        plt.subplot(131)
        plot_pow(*kpow_ref, "k:", label="true")
        plot_pow(*kpow_fid, "k--", alpha=0.5, label="fiducial")
        plt.subplot(132)
        plt.axhline(1.0, linestyle=":", color="k", alpha=0.5)
        plot_trans(kpow_ref[0], (kpow_fid[1] / kpow_ref[1]) ** 0.5, "k--",
                   alpha=0.5, label="fiducial")
        plt.subplot(133)
        plt.axhline(float(np.mean(np.asarray(model.selec_mesh))), linestyle=":",
                    color="k", alpha=0.5)
        plot_coh(kptc_obs[0], kptc_obs[3], "k--", alpha=0.5, label="obs")

        kptcs = jax.tree.map(jnp.concatenate, chains["kptc_white_mesh"])
        plot_powtranscoh(*kptcs, fill=(0.68, 0.95), color=SetDark2(0))
        plot_powtranscoh(*jax.tree.map(lambda x: jnp.median(x, 0), kptcs),
                         color=SetDark2(0), label="post")
        plt.subplot(131)
        plt.legend()
        plt.savefig(save_dir / f"{prefix}kptc.png", dpi=300)
        plt.close()

    # sample-space chains + traces
    transforms = [partial(Chains.thin, thinning=thinning),
                  partial(Chains.choice, n=10, names=["init", "init_"])]
    chains = model.load_runs(chains_dir, 1, 100, transforms=transforms,
                             batch_ndim=2)
    chains.save(chains_dir / f"{prefix}chains_.h5")
    print(chains.shape, "\n")

    plt.figure(figsize=(12, 12))
    chains.print_summary()
    chains.prune().flatten().plot(list(model.groups_) + ["logdensity"])
    plt.savefig(save_dir / f"{prefix}chains_.png", dpi=300)
    plt.close()
    return chains


def make_logdf_mesh(save_dir, start=1, end=100, thinning=1, prefix="",
                    site="count_mesh"):
    """Per-voxel posterior-predictive (logpdf, logcdf) meshes of `site` over
    the thinned chains — goodness-of-fit maps."""
    from montecosmo_tpu.chains import Chains
    from montecosmo_tpu.models.model import FieldLevelModel
    from montecosmo_tpu.utils.safe import nvmap

    save_dir = Path(save_dir)
    chains_dir = save_dir / "chains"

    model = FieldLevelModel.load(save_dir / "model.yaml")
    obs = h5load(save_dir / "obs.h5")

    model.reset()
    model.substitute(obs, from_base=True)
    model.block()

    chains = model.load_runs(chains_dir, start, end,
                             transforms=[partial(Chains.thin, thinning=thinning)],
                             batch_ndim=2)
    samp_names = set().union(*model.groups_.values())
    params = {k: chains.data[k] for k in samp_names if k in chains.data}
    print(f"logdf_mesh on { {k: jnp.shape(v) for k, v in params.items()} }")

    logpdf_mesh, logcdf_mesh = jit(nvmap(
        lambda p: model.logdf_mesh(p, site=site), 2))(params)
    h5save(chains_dir / f"{prefix}logdf_mesh.h5",
           {"logpdf_mesh": np.asarray(logpdf_mesh),
            "logcdf_mesh": np.asarray(logcdf_mesh)})
    print(f"saved {prefix}logdf_mesh.h5: shape {tuple(logpdf_mesh.shape)}\n")
    return logpdf_mesh, logcdf_mesh


def compare_chains(load_dirs, labels, save_dir="./"):
    """Multi-experiment corner + field-statistics comparison."""
    import matplotlib.pyplot as plt
    from montecosmo_tpu.chains import Chains
    from montecosmo_tpu.models.model import FieldLevelModel
    from montecosmo_tpu.plot import SetDark2, corner_plot, plot_pow, plot_powtranscoh

    save_dir = Path(save_dir)
    chainss, sels = [], []
    for load_dir, label in zip(load_dirs, labels):
        load_dir = Path(load_dir)
        model = FieldLevelModel.load(load_dir / "model.yaml")
        chains = Chains.load(load_dir / "chains/chains.h5")
        print("\n", chains.shape)
        sels.append(chains.prune()[list(model.groups) + ["~white_mesh"]])
        chainss.append(chains)

    corner_plot(sels, labels=labels)
    plt.savefig(save_dir / f"triangle_{'_'.join(labels)[:200]}.png", dpi=300)
    plt.close()

    mesh_ref = model.white_mesh
    kpow_ref = model.spectrum(mesh_ref)
    plt.figure(figsize=(12, 4), layout="constrained")
    plt.subplot(131)
    plot_pow(*kpow_ref, "k:", label="true")
    for i, (chains, label) in enumerate(zip(chainss, labels)):
        if "kptc_white_mesh" in chains.data:
            kptcs = jax.tree.map(jnp.concatenate, chains["kptc_white_mesh"])
            plot_powtranscoh(*kptcs, fill=0.68, color=SetDark2(i))
            plot_powtranscoh(*jax.tree.map(lambda x: jnp.median(x, 0), kptcs),
                             color=SetDark2(i), label=label)
    plt.subplot(131)
    plt.legend()
    plt.savefig(save_dir / f"kptc_{'_'.join(labels)[:200]}.png", dpi=300)
    plt.close()


def print_mclmc_config(config, state):
    print("\nss: ", np.asarray(config.step_size))
    print("L: ", np.asarray(config.L))
    invmm = np.asarray(config.inverse_mass_matrix)
    print("invmm mean:", invmm.mean(axis=tuple(range(1, invmm.ndim)))
          if invmm.ndim > 1 else invmm.mean())
