"""Publication-style matplotlib wrappers and data export.

TPU-native counterpart of the reference's plotting layer
(reference: pyqed/style.py — ``subplots:21``, ``curve:54``,
``set_style:75``, ``matplot:155``, ``imshow:203``, ``level_scheme:277``,
``two_scales:313``, ``surf:344``, ``export:403``,
``plot_surface(s):433,474``). Thin, headless-safe (Agg) wrappers; every
function accepts numpy or jax arrays and returns (fig, ax) so scripts
can post-edit.
"""
from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def set_style(fontsize=12):
    """Reference rc defaults (pyqed/style.py:75), sans the LaTeX
    dependency (keeps headless CI images reproducible)."""
    import matplotlib
    matplotlib.rcParams.update({
        "font.size": fontsize,
        "axes.labelsize": fontsize,
        "axes.linewidth": 1.0,
        "xtick.direction": "in",
        "ytick.direction": "in",
        "xtick.top": True,
        "ytick.right": True,
        "lines.linewidth": 1.5,
        "savefig.dpi": 160,
        "savefig.bbox": "tight",
    })


def subplots(nrows=1, ncols=1, figsize=(4, 3), sharex=True, sharey=False,
             **kwargs):
    plt = _mpl()
    set_style()
    return plt.subplots(nrows, ncols, figsize=figsize, sharex=sharex,
                        sharey=sharey, **kwargs)


def curve(x, y, xlabel=None, ylabel=None, output=None, ax=None, **kwargs):
    plt = _mpl()
    x = np.asarray(x)
    y = np.asarray(y)
    if ax is None:
        fig, ax = subplots()
    else:
        fig = ax.figure
    if y.ndim == 1:
        ax.plot(x, y, **kwargs)
    else:
        for col in y.T:
            ax.plot(x, col, **kwargs)
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabel:
        ax.set_ylabel(ylabel)
    if output:
        fig.savefig(output)
        plt.close(fig)
    return fig, ax


def matplot(x, y, f, vmin=None, vmax=None, output=None, xlabel="X",
            ylabel="Y", cmap="viridis", contour=False, diverge=False):
    """2D map of f(x, y) (reference: pyqed/style.py:155). f is indexed
    (len(x), len(y))."""
    plt = _mpl()
    x, y, f = np.asarray(x), np.asarray(y), np.real(np.asarray(f))
    if diverge:
        m = np.max(np.abs(f))
        vmin = -m if vmin is None else vmin
        vmax = m if vmax is None else vmax
        cmap = "RdBu_r"
    fig, ax = subplots()
    im = ax.pcolormesh(x, y, f.T, vmin=vmin, vmax=vmax, cmap=cmap,
                       shading="auto")
    if contour:
        ax.contour(x, y, f.T, colors="k", linewidths=0.4)
    fig.colorbar(im, ax=ax)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if output:
        fig.savefig(output)
        plt.close(fig)
    return fig, ax


def imshow(x, y, f, **kwargs):
    """(reference: pyqed/style.py:203) — same surface as matplot."""
    return matplot(x, y, f, **kwargs)


def level_scheme(E, ylim=None, fname=None, width=0.6):
    """Horizontal energy-level diagram (reference: pyqed/style.py:277)."""
    plt = _mpl()
    E = np.sort(np.real(np.asarray(E)).ravel())
    fig, ax = subplots(figsize=(2.4, 4), sharex=False)
    for e in E:
        ax.hlines(e, -width / 2, width / 2, colors="C0")
    ax.set_xlim(-1, 1)
    ax.set_xticks([])
    ax.set_ylabel("Energy")
    if ylim:
        ax.set_ylim(*ylim)
    if fname:
        fig.savefig(fname)
        plt.close(fig)
    return fig, ax


def two_scales(x, yl, yr, xlabel=None, ylabels=(None, None), output=None):
    """Left/right twin-axis plot (reference: pyqed/style.py:313)."""
    plt = _mpl()
    fig, ax = subplots()
    ax.plot(np.asarray(x), np.asarray(yl), "C0-")
    ax2 = ax.twinx()
    ax2.plot(np.asarray(x), np.asarray(yr), "C1--")
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabels[0]:
        ax.set_ylabel(ylabels[0], color="C0")
    if ylabels[1]:
        ax2.set_ylabel(ylabels[1], color="C1")
    if output:
        fig.savefig(output)
        plt.close(fig)
    return fig, (ax, ax2)


def surf(x, y, f, fname=None, xlabel="X", ylabel="Y", zlabel=None,
         cmap="viridis"):
    """3D surface plot (reference: pyqed/style.py:344)."""
    plt = _mpl()
    set_style()
    X, Y = np.meshgrid(np.asarray(x), np.asarray(y), indexing="ij")
    fig = plt.figure(figsize=(5, 4))
    ax = fig.add_subplot(projection="3d")
    ax.plot_surface(X, Y, np.real(np.asarray(f)), cmap=cmap,
                    linewidth=0, antialiased=True)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if zlabel:
        ax.set_zlabel(zlabel)
    if fname:
        fig.savefig(fname)
        plt.close(fig)
    return fig, ax


def plot_surface(x, y, surface, **kwargs):
    """(reference: pyqed/style.py:433)."""
    return surf(x, y, surface, **kwargs)


def plot_surfaces(x, y, surfaces, fname=None, **kwargs):
    """Several stacked surfaces — e.g. coupled APES sheets
    (reference: pyqed/style.py:474)."""
    plt = _mpl()
    set_style()
    X, Y = np.meshgrid(np.asarray(x), np.asarray(y), indexing="ij")
    fig = plt.figure(figsize=(5, 4))
    ax = fig.add_subplot(projection="3d")
    for k, s in enumerate(surfaces):
        ax.plot_surface(X, Y, np.real(np.asarray(s)), alpha=0.8,
                        linewidth=0)
    if fname:
        fig.savefig(fname)
        plt.close(fig)
    return fig, ax


def export(x, y, z=None, fname="output.dat", fmt="gnuplot"):
    """Write xy(z) data as text (reference: pyqed/style.py:403 —
    gnuplot block format with a blank line between x-slices)."""
    x = np.asarray(x)
    y = np.asarray(y)
    with open(fname, "w") as f:
        if z is None:
            for xi, yi in zip(x, np.atleast_2d(y.T).T):
                f.write(f"{xi} " + " ".join(str(v)
                                            for v in np.atleast_1d(yi))
                        + "\n")
        else:
            z = np.asarray(z)
            for i, xi in enumerate(x):
                for j, yj in enumerate(y):
                    f.write(f"{xi} {yj} {z[i, j]}\n")
                if fmt == "gnuplot":
                    f.write("\n")
    return fname


def read_result(fname):
    """Load a Result NPZ dump (reference: pyqed/style.py:12 reads the
    reference's pickled results; here NPZ, see core.result)."""
    from ..core.result import load_result
    return load_result(fname)
