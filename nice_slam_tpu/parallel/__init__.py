from nice_slam_tpu.parallel.mesh import make_ray_mesh
from nice_slam_tpu.parallel.sharded import (
    make_sharded_map_step, make_sharded_track_frame, sharded_eval_points)
