#!/bin/bash
# Fetch the precomputed Apartment/apartment output bundle (checkpoints +
# meshes) published for NICE-SLAM, for replaying with
# tools/visualizer.py without running the system first.
set -e
mkdir -p output/vis/Apartment
cd output/vis/Apartment
wget https://cvg-data.inf.ethz.ch/nice-slam/vis/Apartment/apartment.zip
unzip apartment.zip
