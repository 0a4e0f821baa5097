"""Smoke tests for the inspection views (files written, counts sane)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.models import GaussianConfig, init_state
from gaussianimage_plus_tpu.utils.visualize import (
    pixel_count_heatmap,
    pixel_count_map,
    radius_circles,
    radius_histogram,
    tile_occupancy_heatmap,
    visual_points,
    visual_points_xyz,
)


@pytest.fixture(scope="module")
def state_cfg():
    cfg = GaussianConfig(H=64, W=96, max_num_points=32, tile_cap=32)
    return init_state(cfg, 32, jax.random.PRNGKey(0)), cfg


def test_pixel_count_map_matches_dense(state_cfg):
    """Per-pixel contributor count must equal the dense oracle's count."""
    state, cfg = state_cfg
    counts = pixel_count_map(state, cfg)
    assert counts.shape == (cfg.H, cfg.W)
    assert counts.min() >= 0 and counts.max() <= int(state.num_active)

    # dense recount: same contribution gate as render_dense
    from gaussianimage_plus_tpu.core.render_dense import render_dense
    from gaussianimage_plus_tpu.models.gaussian_image import (
        colors_of, project)
    from gaussianimage_plus_tpu.core.gaussian2d import ALPHA_THRESHOLD

    proj = project(state.params, state.active, state.bound, cfg)
    # integer pixel coords — the reference convention (render_dense.py:101)
    xs = jnp.arange(cfg.W) * 1.0
    ys = jnp.arange(cfg.H) * 1.0
    dx = xs[None, :, None] - proj.xys[None, None, :, 0]
    dy = ys[:, None, None] - proj.xys[None, None, :, 1]
    c1, c2, c3 = (proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2])
    sigma = 0.5 * (c1 * dx * dx + c3 * dy * dy) + c2 * dx * dy
    alpha = jnp.minimum(1.0, 1.0 * jnp.exp(-sigma))
    contrib = (sigma >= 0) & (alpha >= ALPHA_THRESHOLD) & proj.valid
    # the renderer only blends BINNED members (tile-bbox gate, same as the
    # reference's intersection lists) — apply the same gate to the oracle
    from gaussianimage_plus_tpu.core.binning import _membership
    from gaussianimage_plus_tpu.core.gaussian2d import tile_bounds_for

    tb = tile_bounds_for(cfg.H, cfg.W, cfg.block_h, cfg.block_w)
    member = _membership(proj, tb, cfg.block_h, cfg.block_w)   # [T, N]
    tile_of = ((jnp.arange(cfg.H) // cfg.block_h)[:, None] * tb[0]
               + (jnp.arange(cfg.W) // cfg.block_w)[None, :])  # [H, W]
    contrib = contrib & member[tile_of]
    expect = np.asarray(jnp.sum(contrib, axis=-1))
    np.testing.assert_array_equal(counts, expect)


@pytest.mark.parametrize("fn", [visual_points, visual_points_xyz,
                                radius_circles, tile_occupancy_heatmap,
                                radius_histogram, pixel_count_heatmap])
def test_views_write_files(state_cfg, tmp_path, fn):
    state, cfg = state_cfg
    out = tmp_path / f"{fn.__name__}.png"
    fn(state, cfg, out)
    assert out.exists() and out.stat().st_size > 200
