from montecosmo_tpu.ops.fourier import (
    rfftk, fftk, invlaplace_hat, gradient_hat, gaussian_hat, top_hat,
    bspline, bspline_hat, kaiser_bessel, kaiser_bessel_hat, optim_kcut,
    deconv_paint,
)
from montecosmo_tpu.ops.hermitian import (
    ch2rshape, r2chshape, rg2cgh, cgh2rg, chreshape, hermitian_symmetric,
    boxreshape, scale_shape, mesh2masked, masked2mesh,
)
from montecosmo_tpu.ops.paint import paint, read, interlace, nufft
from montecosmo_tpu.ops.pm import pm_forces, pm_forces2, lpt, nbody_bf, nbody_bf_scan, nbody_rk4
from montecosmo_tpu.ops.background import Background, Esqr
