from nice_slam_tpu.ops.trilinear import (
    normalize_coords,
    trilinear_interp,
    sample_grid_feature,
)
