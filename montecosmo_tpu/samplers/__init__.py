from montecosmo_tpu.samplers.mclmc import (
    IntegratorState, MCLMCAdaptationState,
    mclmc_init, mclmc_warmup, mclmc_run, get_mclmc_warmup, get_mclmc_run,
    mams_warmup, mams_run, get_mams_warmup, get_mams_run,
)
from montecosmo_tpu.samplers.hmc import (
    HMCState, hmc_init, nuts_kernel, hmc_kernel, window_adaptation,
    find_reasonable_step_size,
    mwg_warmup, mwg_kernel_general, sampling_loop_general,
    nutswg_init, nutswg_run, get_nutswg_run, nutswg_warm, get_nutswg_warm,
    get_init_state,
)
from montecosmo_tpu.samplers.optimize import optimize
from montecosmo_tpu.samplers.runner import sample_and_save, save_run
from montecosmo_tpu.samplers.vi import advi, ApproxPosterior
