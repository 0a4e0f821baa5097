"""Visualization: Gaussian ellipses, radius and tile-occupancy heatmaps.

Reference: ``visual_points`` / ``visual_points_xyz`` / ``visual_gs_points``
(models/utils.py:396-897) — matplotlib/cv2 overlays of the fitted Gaussian
set used for qualitative inspection. Host-side (numpy/matplotlib), operates
on a GaussianState + config.
"""

from __future__ import annotations

import os

import numpy as np


def _ellipse_params(cov2d: np.ndarray):
    """(major_sigma, minor_sigma, angle_deg) per Gaussian from packed cov."""
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    tr = 0.5 * (a + c)
    det = a * c - b * b
    disc = np.sqrt(np.maximum(tr * tr - det, 0.0))
    v1 = np.maximum(tr + disc, 1e-8)
    v2 = np.maximum(tr - disc, 1e-8)
    angle = 0.5 * np.degrees(np.arctan2(2 * b, a - c))
    return np.sqrt(v1), np.sqrt(v2), angle


def visual_points(state, cfg, out_path, image=None, sigma_scale=3.0,
                  max_draw=3000):
    """Ellipse overlay of active Gaussians (visual_points,
    models/utils.py:396+). Saves a PNG to ``out_path``."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Ellipse

    from ..models.gaussian_image import effective_cov2d, means_of

    xy = np.asarray(means_of(state.params, cfg))
    cov = np.asarray(effective_cov2d(state.params, state.bound, cfg))
    active = np.asarray(state.active)
    xy, cov = xy[active][:max_draw], cov[active][:max_draw]
    s1, s2, ang = _ellipse_params(cov)

    fig, ax = plt.subplots(figsize=(cfg.W / 96, cfg.H / 96), dpi=96)
    if image is not None:
        ax.imshow(np.asarray(image), extent=[0, cfg.W, cfg.H, 0])
    for i in range(xy.shape[0]):
        ax.add_patch(Ellipse(xy[i], sigma_scale * 2 * s1[i],
                             sigma_scale * 2 * s2[i], angle=ang[i],
                             fill=False, lw=0.4, color="lime", alpha=0.6))
    ax.scatter(xy[:, 0], xy[:, 1], s=0.5, c="red")
    ax.set_xlim(0, cfg.W); ax.set_ylim(cfg.H, 0)
    ax.set_axis_off()
    os.makedirs(os.path.dirname(str(out_path)) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return out_path


def tile_occupancy_heatmap(state, cfg, out_path):
    """Per-tile member counts (the binner's view; tiles-hit heatmap analog of
    visual_gs_points)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from ..core.binning import bin_gaussians
    from ..core.gaussian2d import tile_bounds_for
    from ..models.gaussian_image import project

    proj = project(state.params, state.active, state.bound, cfg)
    bins = bin_gaussians(proj, cfg.H, cfg.W, cap=cfg.tile_cap)
    tb_x, tb_y = tile_bounds_for(cfg.H, cfg.W, cfg.block_h, cfg.block_w)
    counts = np.asarray(bins.count).reshape(tb_y, tb_x)

    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(counts, cmap="viridis")
    fig.colorbar(im, ax=ax, label="gaussians per tile")
    ax.set_title(f"tile occupancy (max {counts.max()}, cap {cfg.tile_cap})")
    os.makedirs(os.path.dirname(str(out_path)) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def radius_histogram(state, cfg, out_path):
    """Distribution of projected bounding radii (radius heatmap analog)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..models.gaussian_image import project

    proj = project(state.params, state.active, state.bound, cfg)
    radii = np.asarray(proj.radii)[np.asarray(proj.valid)]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(radii, bins=50)
    ax.set_xlabel("bounding radius (px)"); ax.set_ylabel("count")
    os.makedirs(os.path.dirname(str(out_path)) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path
