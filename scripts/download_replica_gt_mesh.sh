#!/bin/bash
# Fetch the frustum-culled Replica ground-truth meshes for recon eval.
set -e
mkdir -p Datasets
cd Datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/cull_replica_mesh.zip
unzip cull_replica_mesh.zip
