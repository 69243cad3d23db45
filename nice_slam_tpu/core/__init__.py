from nice_slam_tpu.core.cameras import (
    Intrinsics,
    quat_to_rotmat,
    rotmat_to_quat,
    c2w_from_tensor,
    tensor_from_c2w,
    rays_from_uv,
    rays_full_image,
)
from nice_slam_tpu.core.composite import composite_rays
from nice_slam_tpu.core.sampling import (
    sample_pixels,
    stratified_z_vals,
    surface_z_vals,
    sample_pdf,
    ray_bound_exit,
)
