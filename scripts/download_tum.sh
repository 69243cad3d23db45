#!/bin/bash
# Fetch the three TUM RGB-D sequences evaluated by the paper.
set -e
mkdir -p Datasets/TUM_RGBD
cd Datasets/TUM_RGBD
for seq in rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg2_xyz \
           rgbd_dataset_freiburg3_long_office_household; do
  wget https://vision.in.tum.de/rgbd/dataset/${seq%%_*_*}/$seq.tgz || \
  wget https://vision.in.tum.de/rgbd/dataset/freiburg1/$seq.tgz || \
  wget https://vision.in.tum.de/rgbd/dataset/freiburg2/$seq.tgz || \
  wget https://vision.in.tum.de/rgbd/dataset/freiburg3/$seq.tgz
  tar -xzf $seq.tgz
done
