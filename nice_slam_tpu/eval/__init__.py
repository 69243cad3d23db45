from nice_slam_tpu.eval.ate import align_horn, evaluate_ate
from nice_slam_tpu.eval.recon import calc_3d_metric, calc_2d_metric
