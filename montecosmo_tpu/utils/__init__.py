from montecosmo_tpu.utils.safe import safe_div, nvmap, vlim, get_jit
from montecosmo_tpu.utils.io import (
    psave, pload, ysave, yload, h5save, h5load, h5save_tree, h5load_tree,
)
from montecosmo_tpu.utils.io import to_np
from montecosmo_tpu.utils.profiling import phase, phase_report, trace, annotate, check_finite
