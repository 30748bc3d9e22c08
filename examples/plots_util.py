# Copyright (c) 2026
# MIT License
"""Optional matplotlib rendering for the example ports (``--plot``).

The reference examples validate by eyeballing figures: terrain + horizon /
SVF panels (e.g. examples/horizon/gridded_planar_DEM.py), shadow and
``sw_dir_cor`` frames over a sun track, and a per-time-step Performance
plot (reference gridded_curved_DEM_SRTM.py:272-284).  These helpers
reproduce those figures for every port; they are no-ops when matplotlib
is unavailable (each prints why) so the examples stay runnable anywhere.
"""

import os

import numpy as np


def _plt():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except Exception as exc:  # pragma: no cover
        print(f"--plot requested but matplotlib unavailable: {exc}")
        return None


def plot_topo_panels(out_dir, *, elevation=None, svf=None, slope=None,
                     hori=None, azim=None, name="topo_panels.png"):
    """2x2 panel figure: elevation, SVF, slope, and the domain-mean
    horizon line over azimuth (the reference's horizon figures)."""
    plt = _plt()
    if plt is None:
        return None
    fig, axes = plt.subplots(2, 2, figsize=(11, 9))
    panels = [(elevation, "Elevation [m]", "terrain"),
              (svf, "Sky view factor [-]", "viridis"),
              (np.rad2deg(slope) if slope is not None else None,
               "Slope [deg]", "magma")]
    for ax, (fld, title, cmap) in zip(axes.flat, panels):
        if fld is None:
            ax.axis("off")
            continue
        im = ax.imshow(np.asarray(fld), cmap=cmap)
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.8)
    ax = axes.flat[3]
    if hori is not None and azim is not None:
        h = np.rad2deg(np.asarray(hori))
        a = np.rad2deg(np.asarray(azim))
        ax.plot(a, h.mean(axis=(0, 1)), label="mean")
        ax.fill_between(a, h.min(axis=(0, 1)), h.max(axis=(0, 1)),
                        alpha=0.25, label="min..max")
        ax.set_xlabel("Azimuth [deg]")
        ax.set_ylabel("Horizon elevation [deg]")
        ax.set_title("Horizon over azimuth")
        ax.legend()
    else:
        ax.axis("off")
    fig.tight_layout()
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    print("plotted:", path)
    return path


def plot_field(out_dir, field, name, title, cmap="viridis", vmin=None,
               vmax=None):
    """Single-field figure (shadow map, sw_dir_cor frame, mask...)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(figsize=(7, 6))
    im = ax.imshow(np.asarray(field), cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_title(title)
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    print("plotted:", path)
    return path


def plot_frames(out_dir, frames, *, titles=None, name="frames.png",
                cmap="magma", vmin=0.0, vmax=None, max_frames=6):
    """Row of per-time-step frames (sw_dir_cor / shadow over a sun
    track), mirroring the reference's per-step images."""
    plt = _plt()
    if plt is None:
        return None
    frames = np.asarray(frames)
    idx = np.linspace(0, frames.shape[0] - 1,
                      min(max_frames, frames.shape[0])).astype(int)
    fig, axes = plt.subplots(1, len(idx), figsize=(3.2 * len(idx), 3.4))
    if len(idx) == 1:
        axes = [axes]
    for ax, i in zip(axes, idx):
        im = ax.imshow(frames[i], cmap=cmap, vmin=vmin, vmax=vmax)
        ax.set_title(titles[i] if titles is not None else f"step {i}")
        ax.set_xticks([])
        ax.set_yticks([])
    fig.colorbar(im, ax=axes, shrink=0.75)
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    print("plotted:", path)
    return path


def plot_performance(out_dir, step_times, name="Performance.png"):
    """Per-time-step compute time — the reference's Performance.png
    (gridded_curved_DEM_SRTM.py:272-284)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(figsize=(8, 4))
    t = np.asarray(step_times, dtype=np.float64)
    ax.plot(np.arange(len(t)), t, "o-")
    ax.set_xlabel("Time step")
    ax.set_ylabel("Computing time [s]")
    ax.set_title(f"Mean {t.mean():.4f} s / step "
                 f"(total {t.sum():.3f} s, n={len(t)})")
    fig.tight_layout()
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    print("plotted:", path)
    return path


def plot_location_horizons(out_dir, hori, azim, names,
                           name="horizon_locations.png"):
    """Per-location horizon lines over azimuth (the reference's
    locations example figures)."""
    plt = _plt()
    if plt is None:
        return None
    hori = np.atleast_2d(np.rad2deg(np.asarray(hori)))
    a = np.rad2deg(np.asarray(azim))
    fig, ax = plt.subplots(figsize=(9, 4.5))
    for i, nm in enumerate(names):
        ax.plot(a, hori[i], label=str(nm))
    ax.set_xlabel("Azimuth [deg]")
    ax.set_ylabel("Horizon elevation [deg]")
    ax.legend(fontsize=8)
    fig.tight_layout()
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    print("plotted:", path)
    return path


def plot_series(out_dir, x, y, *, xlabel, ylabel, name, hline=None,
                title=None):
    """Simple line plot (e.g. spatial-mean sw_dir_cor vs sun azimuth with
    the analytic ~1 expectation of the artificial-hemisphere example)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(np.asarray(x), np.asarray(y), "o-")
    if hline is not None:
        ax.axhline(hline, color="k", ls="--", lw=1)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    print("plotted:", path)
    return path
