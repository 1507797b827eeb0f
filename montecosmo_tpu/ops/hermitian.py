"""Hermitian real<->complex repacking and power-preserving Fourier resampling.

`rg2cgh` permutes and reweights a real Gaussian tensor into a complex Hermitian
tensor distributed exactly like `rfftn` of a white-noise field; `cgh2rg` is its
inverse.  This is how the initial-density latent is sampled in unconstrained
N(0,1) coordinates while the model consumes Fourier coefficients.

TPU-native design: the whole bijection is ONE gather with numpy-precomputed
flat indices and weights (cached per shape), instead of a sequence of ~30
dynamic-update-slices over faces/edges/vertices.  A single gather lowers to
one fused HBM pass; the index tensors are compile-time constants.

Math (even dims, rfft layout (Nx,Ny,Nz/2+1), backward FFT convention):
  * bulk 0<kz<Hz : free complex modes; Re <- in[:,:,1:Hz], Im <- in[:,:,Hz+1:].
  * kz in {0,Hz} : 2D-Hermitian planes packed into input planes z=0 and z=Hz,
    recursively (bulk rows -> free modes, border lines -> 1D Hermitian,
    corners -> 8 self-conjugate pure-real modes with doubled variance).
  * mirror entries (the redundant half of each plane) are filled by conjugate
    symmetry so downstream irfftn sees a valid Hermitian tensor.
Variances: Re,Im ~ N(0, n/2) on free modes, Re ~ N(0, n) on self-conjugate
modes — matching rfftn(N(0,I)) exactly in distribution.

Parity: reference `montecosmo/utils.py:769-1139` (rg2cgh/cgh2rg/id_cgh/
chreshape/boxreshape/scale_shape/mesh2masked).
"""
from functools import lru_cache

import numpy as np
from jax import numpy as jnp


# ----------------------------------------------------------------------- shapes
def ch2rshape(shape):
    """Complex Hermitian (rfft) shape -> real shape (assumes even last dim)."""
    return (*shape[:-1], 2 * (shape[-1] - 1))


def r2chshape(shape):
    """Real shape -> complex Hermitian (rfft) shape."""
    return (*shape[:-1], shape[-1] // 2 + 1)


def scale_shape(shape: tuple, scale=1.0):
    """Nearest valid (even) scaled mesh shape."""
    out = 2 * np.rint(np.multiply(shape, scale) / 2).astype(int)
    return tuple(map(int, out))


# ----------------------------------------------------------------------- repack plan
_NORMS = ("backward", "ortho", "forward", "amp")


@lru_cache(maxsize=None)
def _repack_plan(shape):
    """Precompute the repack permutation for a 3D even `shape`.

    Returns numpy arrays over the rfft grid:
      rsrc, isrc : flat input index supplying the real / imag part,
      sgn        : +-1 sign of the imag part (conjugate mirrors),
      selfc      : self-conjugate (pure real, doubled variance) mask,
      canon      : canonical holder mask (True where the coefficient actually
                   owns its input degrees of freedom, False on mirrors),
    and over the flat input grid (for the inverse):
      inv_src    : flat rfft index to read,
      inv_part   : False -> real part, True -> imag part,
      inv_selfc  : cell feeds a self-conjugate coefficient.
    """
    Nx, Ny, Nz = map(int, shape)
    assert Nx % 2 == Ny % 2 == Nz % 2 == 0, "dimension lengths must be even."
    Hx, Hy, Hz = Nx // 2, Ny // 2, Nz // 2
    cshape = (Nx, Ny, Hz + 1)

    def flat(ix, iy, iz):
        return ((ix * Ny) + iy) * Nz + iz

    rsrc = np.zeros(cshape, np.int32)
    isrc = np.zeros(cshape, np.int32)
    sgn = np.ones(cshape, np.float32)
    selfc = np.zeros(cshape, bool)
    canon = np.zeros(cshape, bool)

    IX = np.arange(Nx)[:, None]
    IY = np.arange(Ny)[None, :]

    # bulk: free complex modes, one real dof pair per coefficient
    kz = np.arange(1, Hz)
    rsrc[:, :, 1:Hz] = flat(IX[..., None], IY[..., None], kz)
    isrc[:, :, 1:Hz] = flat(IX[..., None], IY[..., None], Hz + kz)
    canon[:, :, 1:Hz] = True

    # kz in {0, Hz}: 2D Hermitian planes packed into input planes z=0 and z=Hz
    for kk, zk in ((0, 0), (Hz, Hz)):
        # canonical rows 0 < j < Hy
        j = np.arange(1, Hy)
        rsrc[:, 1:Hy, kk] = flat(IX, j, zk)
        isrc[:, 1:Hy, kk] = flat(IX, Hy + j, zk)
        canon[:, 1:Hy, kk] = True
        # mirror rows Hy < j < Ny: conj of (-i, -j)
        j = np.arange(Hy + 1, Ny)
        jm = Ny - j
        im = (-IX) % Nx
        rsrc[:, Hy + 1:, kk] = flat(im, jm, zk)
        isrc[:, Hy + 1:, kk] = flat(im, Hy + jm, zk)
        sgn[:, Hy + 1:, kk] = -1.0
        # border lines j in {0, Hy}: 1D Hermitian along x
        for j in (0, Hy):
            i = np.arange(1, Hx)
            rsrc[1:Hx, j, kk] = flat(i, j, zk)
            isrc[1:Hx, j, kk] = flat(Hx + i, j, zk)
            canon[1:Hx, j, kk] = True
            i = np.arange(Hx + 1, Nx)
            im = Nx - i
            rsrc[Hx + 1:, j, kk] = flat(im, j, zk)
            isrc[Hx + 1:, j, kk] = flat(Hx + im, j, zk)
            sgn[Hx + 1:, j, kk] = -1.0
            # self-conjugate corners i in {0, Hx}
            for i in (0, Hx):
                rsrc[i, j, kk] = flat(i, j, zk)
                isrc[i, j, kk] = flat(i, j, zk)  # unused (weight 0)
                selfc[i, j, kk] = True
                canon[i, j, kk] = True

    # inverse: every input cell is owned by exactly one canonical assignment
    n = Nx * Ny * Nz
    coeff_flat = np.arange(np.prod(cshape), dtype=np.int32).reshape(cshape)
    inv_src = np.full(n, -1, np.int32)
    inv_part = np.zeros(n, bool)
    inv_selfc = np.zeros(n, bool)

    free = canon & ~selfc
    inv_src[rsrc[free]] = coeff_flat[free]
    inv_src[isrc[free]] = coeff_flat[free]
    inv_part[isrc[free]] = True
    inv_src[rsrc[selfc]] = coeff_flat[selfc]
    inv_selfc[rsrc[selfc]] = True
    assert (inv_src >= 0).all(), "repack plan does not cover all input cells"

    return dict(rsrc=rsrc, isrc=isrc, sgn=sgn, selfc=selfc, canon=canon,
                inv_src=inv_src, inv_part=inv_part, inv_selfc=inv_selfc)


def _base_weight(shape, norm):
    n = float(np.prod(shape))
    if norm == "backward":
        return (n / 2) ** 0.5
    if norm == "ortho":
        return 0.5 ** 0.5
    if norm == "forward":
        return 1 / (2 * n) ** 0.5
    if norm == "amp":
        return 1.0
    raise ValueError(f"norm must be one of {_NORMS}")


def rg2cgh(mesh, norm="backward"):
    """Real Gaussian tensor -> complex Gaussian Hermitian tensor (one gather).

    `rg2cgh(N(0,I), norm)` is distributed exactly as `rfftn(N(0,I), norm)`, and
    with `mean, amp = cgh2rg(meank, norm), cgh2rg(ampk, 'amp')`,
    `rg2cgh(mean + amp * N(0,I), norm)` is distributed as
    `meank + ampk * rfftn(N(0,I), norm)`.

    norm='amp' returns the RMS amplitude of the (real, imag) source pair —
    used to transport per-mode std fields into the real packing.
    """
    shape = tuple(mesh.shape)
    plan = _repack_plan(shape)
    flat = mesh.reshape(-1)
    re = flat[plan["rsrc"]]
    im = flat[plan["isrc"]]
    if norm == "amp":
        return ((re**2 + im**2) / 2) ** 0.5
    w = _base_weight(shape, norm)
    wr = np.where(plan["selfc"], w * 2**0.5, w).astype(mesh.dtype)
    wi = np.where(plan["selfc"], 0.0, w * plan["sgn"]).astype(mesh.dtype)
    return jax_complex(re * wr, im * wi)


def cgh2rg(meshk, norm="backward"):
    """Complex Gaussian Hermitian tensor -> real Gaussian tensor (inverse of
    `rg2cgh`, also a single gather).

    norm='amp' assigns to each real cell the real part of the coefficient it
    feeds (same amplitude for both real- and imag-part cells) — the transport
    of a per-mode std field into real packing.
    """
    shape = ch2rshape(meshk.shape)
    plan = _repack_plan(tuple(shape))
    re = meshk.real.reshape(-1)
    if norm == "amp":
        out = re[plan["inv_src"]]
        return out.reshape(shape)
    im = meshk.imag.reshape(-1)
    w = _base_weight(shape, norm)
    inv_w = np.where(plan["inv_selfc"], 1 / (w * 2**0.5), 1 / w).astype(re.dtype)
    out = jnp.where(plan["inv_part"], im[plan["inv_src"]], re[plan["inv_src"]]) * inv_w
    return out.reshape(shape)


def jax_complex(re, im):
    return re + 1j * im


# ----------------------------------------------------------------------- resampling
def hermitian_symmetric(arr):
    """Hermitian symmetric of a full-FFT-indexed tensor: out[i] = conj(arr[-i mod N]).

    A tensor has Hermitian symmetry iff it equals its Hermitian symmetric.
    """
    for ax, N in enumerate(arr.shape):
        arr = jnp.take(arr, (-np.arange(N)) % N, axis=ax)
    return arr.conj()


def chreshape(mesh, shape):
    """Resample a complex Hermitian (rfft-layout) tensor to a new rfft `shape`,
    truncating or padding so that Hermitian symmetry and the mean coefficient
    power are preserved (Nyquist planes are aggregated / split with 1/sqrt(2)
    weights), and the represented density-contrast field keeps its amplitude.

    All index maps are numpy constants -> a static gather (+ scatter when
    padding) on device.
    """
    mesh = jnp.asarray(mesh)
    in_shape = tuple(mesh.shape)
    shape = tuple(shape)
    if in_shape == shape:
        return mesh
    ndim = len(shape)
    scale = np.prod(np.divide(ch2rshape(shape), ch2rshape(in_shape)))

    # 1) fold Nyquist planes of truncated axes (last axis first: its fold
    #    mirrors across the leading axes, which must still be untouched)
    for ax in reversed(range(ndim)):
        ms, s = in_shape[ax], shape[ax]
        if s >= ms:
            continue
        if ax == ndim - 1:
            plane = jnp.take(mesh, s - 1, axis=ax)
            plane = (plane + hermitian_symmetric(plane)) / 2**0.5
            mesh = mesh.at[(slice(None),) * ax + (s - 1,)].set(plane)
        else:
            pos, neg = s // 2, ms - s // 2
            folded = (jnp.take(mesh, pos, axis=ax) + jnp.take(mesh, neg, axis=ax)) / 2**0.5
            mesh = mesh.at[(slice(None),) * ax + (neg,)].set(folded)

    # 2) centered crop (gather) then centered pad (scatter), positive
    #    frequencies at the start, negative at the end, per axis
    def keep_idx(ms, s, last):
        if last:
            return np.arange(min(ms, s))
        k = min(ms, s)
        return np.concatenate([np.arange(k // 2), ms - k // 2 + np.arange(k // 2)])

    def dest_idx(ms, s, last):
        if last:
            return np.arange(min(ms, s))
        k = min(ms, s)
        return np.concatenate([np.arange(k // 2), s - k // 2 + np.arange(k // 2)])

    src = tuple(keep_idx(in_shape[ax], shape[ax], ax == ndim - 1) for ax in range(ndim))
    dst = tuple(dest_idx(in_shape[ax], shape[ax], ax == ndim - 1) for ax in range(ndim))
    cropped = mesh[np.ix_(*src)]
    if all(shape[ax] <= in_shape[ax] for ax in range(ndim)):
        out = cropped
    else:
        out = jnp.zeros(shape, dtype=mesh.dtype).at[np.ix_(*dst)].set(cropped)

    # 3) split Nyquist planes of padded axes
    for ax in range(ndim):
        ms, s = in_shape[ax], shape[ax]
        if s <= ms:
            continue
        if ax == ndim - 1:
            out = out.at[(slice(None),) * ax + (ms - 1,)].divide(2**0.5)
        else:
            pos, neg = ms // 2, s - ms // 2
            out = out.at[(slice(None),) * ax + (neg,)].divide(2**0.5)
            out = out.at[(slice(None),) * ax + (pos,)].set(
                jnp.take(out, neg, axis=ax))

    return out * scale


def boxreshape(mesh, shape):
    """Real-space centered pad or crop of a tensor to `shape` (even dims)."""
    shape = np.asarray(shape)
    ms = np.asarray(mesh.shape)
    assert np.all(shape % 2 == 0) and np.all(ms % 2 == 0), "dimension lengths must be even."

    half_down = np.maximum(ms - shape, 0) // 2
    mesh = mesh[tuple(slice(h, None if h == 0 else -h) for h in half_down)]
    half_up = np.maximum(shape - np.asarray(mesh.shape), 0) // 2
    return jnp.pad(mesh, tuple((h, h) for h in half_up))


# ----------------------------------------------------------------------- masking
def mesh2masked(mesh, mask=None):
    """Extract the masked entries of a mesh (identity if mask is None)."""
    if mask is None:
        return mesh
    return mesh[..., mask]


def masked2mesh(masked, mask=None):
    """Scatter masked entries back into a zero mesh (identity if mask is None)."""
    if mask is None:
        return masked
    shape = jnp.shape(masked)[:-1] + jnp.shape(mask)
    return jnp.zeros(shape, dtype=masked.dtype).at[..., mask].set(masked)
