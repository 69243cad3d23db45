#!/bin/bash
# Fetch the precomputed Replica/room1 output bundle (checkpoints +
# meshes) published for NICE-SLAM, for replaying with
# tools/visualizer.py without running the system first.
set -e
mkdir -p output/vis/Replica
cd output/vis/Replica
wget https://cvg-data.inf.ethz.ch/nice-slam/vis/Replica/room1.zip
unzip room1.zip
