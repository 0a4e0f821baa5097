from .gaussian_image import (
    GaussianConfig,
    GaussianParams,
    GaussianState,
    colors_of,
    effective_cov2d,
    grow,
    init_state,
    means_of,
    project,
    prune,
    psd_mask_effective,
    render,
)
