#!/bin/bash
# Fetch the Azure-Kinect Apartment capture.
set -e
mkdir -p Datasets
cd Datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Apartment.zip
unzip Apartment.zip
