#!/bin/bash
# Fetch the 500-frame ScanNet demo subset used by configs/Demo/demo.yaml.
set -e
mkdir -p Datasets
cd Datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Demo.zip
unzip Demo.zip
