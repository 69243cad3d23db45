from nice_slam_tpu.engine.tracker import TrackerConfig, make_track_frame
from nice_slam_tpu.engine.mapper import MapperConfig, make_map_step
from nice_slam_tpu.engine.keyframes import KeyframeStore
