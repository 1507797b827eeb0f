"""Plotting: mesh projections, power/transfer/coherence panels with credible
bands, pdf panels, native corner plots, trace grids, themes.

Parity: reference `montecosmo/plot.py` (plot_mesh:56-126, animations:129-194,
spectra panels:202-309, plot_pdf:312-361, palette/theme:365-459).  The corner
plot is implemented natively (the reference delegates to getdist).
"""
from itertools import product

import matplotlib as mpl
import matplotlib.pyplot as plt
import numpy as np
from jax import numpy as jnp

import jax

from montecosmo_tpu.utils.safe import vlim

# ----------------------------------------------------------------------- palette
_DARK2 = plt.get_cmap("Dark2").colors
_SET2 = plt.get_cmap("Set2").colors


def SetDark2(i, light=False):
    """Paired qualitative palette: Dark2 for lines, Set2 for fills."""
    return (_SET2 if light else _DARK2)[i % 8]


def theme(dark=False):
    """Switch the global matplotlib theme."""
    if dark:
        plt.style.use("dark_background")
        mpl.rcParams["figure.facecolor"] = "#111111"
        mpl.rcParams["axes.facecolor"] = "#111111"
    else:
        plt.style.use("default")


def color_switch(color, dark=None):
    """Flip black<->white line colors for the current theme."""
    if dark is None:
        dark = mpl.rcParams["axes.facecolor"] in ("#111111", "black")
    if color in ("k", "black"):
        return "w" if dark else "k"
    return color


# ----------------------------------------------------------------------- meshes
def plot_mesh(mesh, box_size=None, axis=2, fraction=1.0, vlims=None, cmap="magma",
              colorbar=True, **kw):
    """Mean projection of a central slab of the mesh along `axis`."""
    mesh = np.asarray(mesh)
    n = mesh.shape[axis]
    lo = int(n * (1 - fraction) / 2)
    hi = max(lo + 1, n - lo)
    sl = [slice(None)] * 3
    sl[axis] = slice(lo, hi)
    proj = mesh[tuple(sl)].mean(axis)

    extent = None
    if box_size is not None:
        axes = [i for i in range(3) if i != axis]
        extent = (0, box_size[axes[1]], 0, box_size[axes[0]])
    if vlims is None:
        vmin = vmax = None
    else:
        vmin, vmax = np.asarray(vlim(jnp.asarray(proj), vlims))
    im = plt.imshow(proj, extent=extent, cmap=cmap, vmin=vmin, vmax=vmax, **kw)
    if colorbar:
        plt.colorbar(im, fraction=0.046, pad=0.04)
    return im


def anim_meshes(meshes, box_size=None, axis=2, fraction=1.0, interval=100,
                cmap="magma", **kw):
    """Animate a sequence of meshes (e.g. N-body snapshots)."""
    from matplotlib.animation import FuncAnimation

    fig = plt.gcf()
    im = plot_mesh(meshes[0], box_size, axis, fraction, cmap=cmap,
                   colorbar=False, **kw)

    def update(i):
        mesh = np.asarray(meshes[i])
        n = mesh.shape[axis]
        lo = int(n * (1 - fraction) / 2)
        hi = max(lo + 1, n - lo)
        sl = [slice(None)] * 3
        sl[axis] = slice(lo, hi)
        im.set_data(mesh[tuple(sl)].mean(axis))
        return (im,)

    return FuncAnimation(fig, update, frames=len(meshes), interval=interval)


def anim_scan(mesh, axis=2, interval=50, cmap="magma", **kw):
    """Animate a scan through the slices of one mesh."""
    from matplotlib.animation import FuncAnimation

    mesh = np.asarray(mesh)
    fig = plt.gcf()
    sl = [slice(None)] * 3
    sl[axis] = 0
    im = plt.imshow(mesh[tuple(sl)], cmap=cmap, **kw)

    def update(i):
        sl[axis] = i
        im.set_data(mesh[tuple(sl)])
        return (im,)

    return FuncAnimation(fig, update, frames=mesh.shape[axis], interval=interval)


# ----------------------------------------------------------------------- spectra
def _fill_band(x, ys, prob, color=None, alpha=0.25):
    """Equal-tail credible band(s) over the leading (chain) axis of ys."""
    for p in np.atleast_1d(prob):
        lo = np.quantile(np.asarray(ys), (1 - p) / 2, axis=0)
        hi = np.quantile(np.asarray(ys), (1 + p) / 2, axis=0)
        plt.fill_between(np.asarray(x), lo, hi, color=color, alpha=alpha, lw=0)


def plot_pow(k, pow, *args, fill=None, color=None, **kw):
    """P(k) panel (loglog); with batched pow and `fill`, credible bands."""
    plt.xlabel(r"$k$ [$h/\mathrm{Mpc}$]")
    plt.ylabel(r"$P(k)$ [$(\mathrm{Mpc}/h)^3$]")
    plt.xscale("log")
    plt.yscale("log")
    if fill is not None and np.ndim(pow) > 1:
        k0 = np.asarray(k)[0] if np.ndim(k) > 1 else np.asarray(k)
        _fill_band(k0, pow, fill, color=color)
        return
    return plt.plot(np.asarray(k), np.asarray(pow), *args, color=color, **kw)


def plot_trans(k, trans, *args, fill=None, color=None, **kw):
    """Transfer function panel (semilogx)."""
    plt.xlabel(r"$k$ [$h/\mathrm{Mpc}$]")
    plt.ylabel(r"$(P_1 / P_0)^{1/2}$")
    plt.xscale("log")
    if fill is not None and np.ndim(trans) > 1:
        k0 = np.asarray(k)[0] if np.ndim(k) > 1 else np.asarray(k)
        _fill_band(k0, trans, fill, color=color)
        return
    return plt.plot(np.asarray(k), np.asarray(trans), *args, color=color, **kw)


def plot_coh(k, coh, *args, fill=None, color=None, **kw):
    """Coherence panel (semilogx)."""
    plt.xlabel(r"$k$ [$h/\mathrm{Mpc}$]")
    plt.ylabel(r"$P_{01} / (P_0 P_1)^{1/2}$")
    plt.xscale("log")
    if fill is not None and np.ndim(coh) > 1:
        k0 = np.asarray(k)[0] if np.ndim(k) > 1 else np.asarray(k)
        _fill_band(k0, coh, fill, color=color)
        return
    return plt.plot(np.asarray(k), np.asarray(coh), *args, color=color, **kw)


def plot_powtranscoh(k, pow, trans, coh, *args, fill=None, color=None, label=None,
                     **kw):
    """3-panel (P, transfer, coherence) figure; batched inputs + `fill` give
    credible bands."""
    plt.subplot(131)
    plot_pow(k, pow, *args, fill=fill, color=color, label=label, **kw)
    plt.subplot(132)
    plot_trans(k, trans, *args, fill=fill, color=color, label=label, **kw)
    plt.subplot(133)
    plot_coh(k, coh, *args, fill=fill, color=color, label=label, **kw)


def plot_pdf(samples, bins=64, density=True, *args, **kw):
    """Histogram-based pdf panel of flattened samples."""
    samples = np.asarray(samples).reshape(-1)
    hist, edges = np.histogram(samples, bins=bins, density=density)
    centers = (edges[:-1] + edges[1:]) / 2
    return plt.plot(centers, hist, *args, **kw)


# ----------------------------------------------------------------------- corner
def corner_plot(chains, labels=None, markers=None, prob=(0.68, 0.95), bins=40,
                figsize=None, colors=None, smooth=1.5):
    """Native triangle/corner plot of one or several chain containers
    (replaces the reference's getdist dependency).

    chains : a Chains (or list of Chains) whose scalar variables are plotted;
    markers : dict of name -> truth value drawn as reference lines.
    """
    from scipy.ndimage import gaussian_filter, gaussian_filter1d

    if not isinstance(chains, (list, tuple)):
        chains = [chains]
    if colors is None:
        colors = [SetDark2(i) for i in range(len(chains))]

    # variables: scalar keys of the first container
    names = [k for k, v in chains[0].data.items()
             if np.asarray(v).ndim <= 2 or np.asarray(v).size == np.asarray(v).shape[0]]
    names = [k for k in names if np.asarray(chains[0].data[k]).reshape(
        np.asarray(chains[0].data[k]).shape[0], -1).shape[-1] >= 1
        and np.asarray(chains[0].data[k]).ndim <= 2]
    n = len(names)
    if n == 0:
        raise ValueError("no scalar variables to corner-plot")

    flat = [{k: np.asarray(c.data[k]).reshape(-1) for k in names} for c in chains]
    lims = {k: (min(f[k].min() for f in flat), max(f[k].max() for f in flat))
            for k in names}

    fig, axes = plt.subplots(n, n, figsize=figsize or (2 * n, 2 * n),
                             squeeze=False)
    for i, ki in enumerate(names):
        for j, kj in enumerate(names):
            ax = axes[i][j]
            if j > i:
                ax.axis("off")
                continue
            for c, f in enumerate(flat):
                if i == j:
                    hist, edges = np.histogram(f[ki], bins=bins, range=lims[ki],
                                               density=True)
                    hist = gaussian_filter1d(hist, smooth)
                    centers = (edges[:-1] + edges[1:]) / 2
                    ax.plot(centers, hist, color=colors[c],
                            label=(labels[c] if labels and i == 0 else None))
                else:
                    h, xe, ye = np.histogram2d(f[kj], f[ki], bins=bins,
                                               range=(lims[kj], lims[ki]))
                    h = gaussian_filter(h.T, smooth)
                    levels = _contour_levels(h, prob)
                    xc = (xe[:-1] + xe[1:]) / 2
                    yc = (ye[:-1] + ye[1:]) / 2
                    ax.contourf(xc, yc, h, levels=[*levels, h.max() + 1e-9],
                                colors=[colors[c]], alpha=0.3)
                    ax.contour(xc, yc, h, levels=levels, colors=[colors[c]],
                               linewidths=1)
            if markers and ki in markers and i == j:
                ax.axvline(markers[ki], color="0.4", ls=":")
            if markers and i != j:
                if kj in markers:
                    ax.axvline(markers[kj], color="0.4", ls=":")
                if ki in markers:
                    ax.axhline(markers[ki], color="0.4", ls=":")
            lab_i = chains[0].labels.get(ki, ki) if chains[0].labels else ki
            lab_j = chains[0].labels.get(kj, kj) if chains[0].labels else kj
            if i == n - 1:
                ax.set_xlabel(f"${lab_j}$")
            else:
                ax.set_xticklabels([])
            if j == 0 and i != 0:
                ax.set_ylabel(f"${lab_i}$")
            elif i != j:
                ax.set_yticklabels([])
            if i == j:
                ax.set_yticks([])
    if labels:
        axes[0][0].legend(loc="upper left", bbox_to_anchor=(1.05, 1.0))
    fig.align_labels()
    plt.subplots_adjust(wspace=0.06, hspace=0.06)
    return fig


def _contour_levels(hist, prob):
    """Density levels enclosing the given probability masses."""
    flat = np.sort(hist.reshape(-1))[::-1]
    cum = np.cumsum(flat)
    cum /= cum[-1]
    levels = []
    for p in sorted(np.atleast_1d(prob), reverse=True):
        idx = np.searchsorted(cum, p)
        levels.append(flat[min(idx, len(flat) - 1)])
    return sorted(set(levels))


# ----------------------------------------------------------------------- traces
def plot_chains(chains, names=None, batch_ndim=2, grid=True, log=False):
    """Grid of per-chain trace plots (one subfigure per name)."""
    if names is None:
        names = list(chains.data)
    else:
        names = list(np.atleast_1d(names))

    n_conc = max(batch_ndim - 2, 0)
    n_exp = max(2 - batch_ndim, 0)

    def conc_exp(v):
        for _ in range(n_conc):
            v = jnp.concatenate(v)
        return jnp.expand_dims(v, axis=tuple(range(n_exp)))

    conc = jax.tree.map(conc_exp, chains[names])
    n_chains = jnp.shape(next(iter(conc.data.values())))[0]

    fig = plt.gcf()
    subfigs = np.atleast_1d(fig.subfigures(len(names), 1))
    for subfig, name in zip(subfigs, names):
        subfig.suptitle(f"{name}")
        axs = np.atleast_1d(subfig.subplots(1, n_chains, sharey="row"))
        subfig.subplots_adjust(wspace=0)
        for k, v in conc[[name]].data.items():
            label = conc.labels.get(k) if conc.labels else None
            for i_c, ax in enumerate(axs):
                ax.plot(np.asarray(v[i_c]).reshape(np.asarray(v[i_c]).shape[0], -1),
                        label=k if label is None else "$" + label + "$")
                if log:
                    ax.set_yscale("log")
                ax.grid(grid)
        handles, _ = axs[-1].get_legend_handles_labels()
        if handles:
            axs[-1].legend()
    return fig


def plot_powspec_ppc(kmean, obs, tril=None, preds=None, poles=(0, 2, 4),
                     prob=(0.68, 0.95), axs=None):
    """Posterior-predictive multipole panel for observable='powspec'.

    kmean : (n_k,) bin centers; obs (n_ell, n_k) observed multipoles;
    tril  : optional (n_k, n_ell, n_ell) covariance Cholesky — the observed
            points get +-1 sigma bars from its diagonal contribution;
    preds : optional (n_samples, n_ell, n_k) posterior-predictive draws —
            median line + credible bands per multipole.
    Returns the axes (one per multipole).
    """
    kmean = np.asarray(kmean)
    obs = np.asarray(obs)
    n_ell = obs.shape[0]
    if axs is None:
        _, axs = plt.subplots(1, n_ell, figsize=(4 * n_ell, 3.2),
                              layout="constrained", squeeze=False)
        axs = axs[0]

    sig = None
    if tril is not None:
        tril = np.asarray(tril)
        sig = np.sqrt(np.sum(tril**2, axis=-1)).T        # (n_ell, n_k)

    for i, ell in enumerate(poles[:n_ell]):
        ax = axs[i]
        if preds is not None:
            ys = np.asarray(preds)[:, i, :]
            for p in sorted(prob, reverse=True):
                lo, hi = np.percentile(ys, [50 - 50 * p, 50 + 50 * p], axis=0)
                ax.fill_between(kmean, lo, hi, color=SetDark2(0), alpha=0.25)
            ax.plot(kmean, np.median(ys, 0), color=SetDark2(0), label="post")
        if sig is not None:
            ax.errorbar(kmean, obs[i], yerr=sig[i], fmt="k.", capsize=2,
                        label="obs")
        else:
            ax.plot(kmean, obs[i], "k.", label="obs")
        ax.set_xlabel(r"$k$ [$h$/Mpc]")
        ax.set_ylabel(rf"$P_{{{int(ell)}}}(k)$")
        ax.set_xscale("log")
        if int(ell) == 0:
            ax.set_yscale("log")
        ax.legend()
    return axs
