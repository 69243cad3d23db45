#!/bin/bash
# Fetch the Replica SLAM sequences (the packaging published for NICE-SLAM).
set -e
mkdir -p Datasets
cd Datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
