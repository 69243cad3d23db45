#!/bin/bash
# Fetch the precomputed ScanNet/scene0000 output bundle (checkpoints +
# meshes) published for NICE-SLAM, for replaying with
# tools/visualizer.py without running the system first.
set -e
mkdir -p output/vis/ScanNet
cd output/vis/ScanNet
wget https://cvg-data.inf.ethz.ch/nice-slam/vis/ScanNet/scene0000.zip
unzip scene0000.zip
