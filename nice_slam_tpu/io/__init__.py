from nice_slam_tpu.io.datasets import get_dataset, DATASET_REGISTRY
