"""Generic chunked run-and-save driver for the NUTS / within-Gibbs kernels.

Parity: reference `montecosmo/samplers.py:596-663` (numpyro MCMC `save_run` /
`sample_and_save`): warmup + chunked runs saved as `.npz` with a pickled
resumable last state.
"""
import numpy as np
from jax import numpy as jnp, random as jr

from montecosmo_tpu.utils.io import psave, pload, to_np


def save_run(samples, infos, last_state, i_run: int, path: str,
             group_by_chain: bool = True):
    """Save one run's samples (+ infos) as `.npz` and the last state as a
    pickle (`_last_state.p`, overwritten per run for resume)."""
    out = {}
    for k, v in {**samples, **(infos or {})}.items():
        if isinstance(v, dict):
            for kk, vv in v.items():
                out[f"{k}/{kk}"] = to_np(vv)
        else:
            out[k] = to_np(v)
    if "num_integration_steps" in out and "n_evals" not in out:
        out["n_evals"] = out.pop("num_integration_steps")
    np.savez(f"{path}_{i_run}.npz", **out)
    psave(last_state, f"{path}_last_state.p")


def sample_and_save(run_fn, init_state, path: str, start: int = 0, end: int = 1,
                    warmup_fn=None, seed=42, resume: bool = True):
    """Warmup (if `warmup_fn`) then chunked runs, each saved via `save_run`.

    run_fn(seed, state) -> (samples, infos, last_state)
    warmup_fn(seed, state) -> (samples, infos, last_state[, config...])
    Resumes from `{path}_last_state.p` when it exists.
    """
    if isinstance(seed, int):
        seed = jr.key(seed)
    state = init_state

    import os
    if resume and os.path.exists(f"{path}_last_state.p"):
        state = pload(f"{path}_last_state.p")
        while os.path.exists(f"{path}_{start}.npz") and start <= end:
            start += 1
        print(f"Resuming at run {start}")
    elif warmup_fn is not None:
        print(f"run {start}/{end} (warmup)")
        seed, sub = jr.split(seed)
        out = warmup_fn(sub, state)
        samples, infos, state = out[0], out[1], out[2]
        save_run(samples, infos, state, start, path)
        start += 1

    for i_run in range(start, end + 1):
        print(f"run {i_run}/{end}")
        seed, sub = jr.split(seed)
        samples, infos, state = run_fn(sub, state)
        save_run(samples, infos, state, i_run, path)
    return state
