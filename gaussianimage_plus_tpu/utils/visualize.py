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


def visual_points_xyz(state, cfg, out_path, colors=None, grid_size=16):
    """Center scatter on black with a tile grid (visual_points_xyz,
    models/utils.py:489-568): one dot per active Gaussian, colored by the
    Gaussian's color (red when ``colors`` is None, like the reference)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..models.gaussian_image import colors_of, means_of

    xy = np.asarray(means_of(state.params, cfg))
    active = np.asarray(state.active)
    if colors is None:
        c = "red"
    else:
        c = np.clip(np.asarray(colors_of(state.params, cfg))[active], 0, 1)
    xy = xy[active]

    fig, ax = plt.subplots(figsize=(cfg.W / 96, cfg.H / 96), dpi=96)
    ax.set_facecolor("black")
    ax.scatter(xy[:, 0], xy[:, 1], s=4, c=c)
    for y in np.linspace(0, cfg.H, grid_size + 1):
        ax.axhline(y, color="gray", lw=0.5)
    for x in np.linspace(0, cfg.W, grid_size + 1):
        ax.axvline(x, color="gray", lw=0.5)
    ax.set_xlim(0, cfg.W); ax.set_ylim(cfg.H, 0)
    ax.set_axis_off()
    os.makedirs(os.path.dirname(str(out_path)) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", pad_inches=0,
                facecolor="black")
    plt.close(fig)
    return out_path


def radius_circles(state, cfg, out_path, grid_size=16):
    """Filled circle of the projected bounding radius per Gaussian, colored
    by its color (the radius/tiles-hit views of visual_points,
    models/utils.py:595-597)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle

    from ..models.gaussian_image import colors_of, project

    proj = project(state.params, state.active, state.bound, cfg)
    valid = np.asarray(proj.valid)
    xy = np.asarray(proj.xys)[valid]
    radii = np.asarray(proj.radii)[valid]
    cols = np.clip(np.asarray(colors_of(state.params, cfg))[valid], 0, 1)

    fig, ax = plt.subplots(figsize=(cfg.W / 96, cfg.H / 96), dpi=96)
    ax.set_facecolor("black")
    for i in range(xy.shape[0]):
        ax.add_patch(Circle(xy[i], radii[i], color=cols[i], alpha=0.8))
    for y in np.linspace(0, cfg.H, grid_size + 1):
        ax.axhline(y, color="gray", lw=0.5)
    for x in np.linspace(0, cfg.W, grid_size + 1):
        ax.axvline(x, color="gray", lw=0.5)
    ax.set_xlim(0, cfg.W); ax.set_ylim(cfg.H, 0)
    ax.set_axis_off()
    os.makedirs(os.path.dirname(str(out_path)) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", pad_inches=0,
                facecolor="black")
    plt.close(fig)
    return out_path


def pixel_count_map(state, cfg):
    """[H, W] int — number of Gaussians actually contributing per pixel (the
    reference rasterizer's per_pix_gs_nums return, forward.cu:650-672
    contribution gate)."""
    import jax
    import jax.numpy as jnp

    from ..core.binning import bin_gaussians
    from ..core.gaussian2d import tile_bounds_for
    from ..core.render_tiled import _raster_core, _tiles_to_image
    from ..models.gaussian_image import colors_of, project

    @jax.jit
    def count(state):
        proj = project(state.params, state.active, state.bound, cfg)
        bins = bin_gaussians(
            proj, cfg.H, cfg.W, cap=cfg.tile_cap, block_h=cfg.block_h,
            block_w=cfg.block_w,
            method="top_k" if cfg.bin_method == "pallas" else cfg.bin_method)
        colors = colors_of(state.params, cfg)
        opacity = jnp.ones((cfg.max_num_points,), proj.xys.dtype)
        (tb_x, tb_y, *_, contrib, _w) = _raster_core(
            proj.xys, proj.conics, colors, opacity, bins.ids, bins.mask,
            cfg.H, cfg.W, cfg.block_h, cfg.block_w)
        n = jnp.sum(contrib, axis=-1, dtype=jnp.float32)[..., None]  # [T,P,1]
        return _tiles_to_image(jnp.broadcast_to(n, n.shape[:2] + (3,)),
                               cfg.H, cfg.W, tb_x, tb_y,
                               cfg.block_h, cfg.block_w)[..., 0]

    return np.asarray(count(state)).astype(np.int32)


def pixel_count_heatmap(state, cfg, out_path):
    """Per-pixel contributing-Gaussian count heatmap with colorbar
    (visual_gs_points, models/utils.py:831-897)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    counts = pixel_count_map(state, cfg)
    fig, ax = plt.subplots(figsize=(10, 7))
    im = ax.imshow(counts)
    fig.colorbar(im, ax=ax)
    ax.set_title("the number of gs per pixel")
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
