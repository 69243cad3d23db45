#!/bin/bash
# Fetch the CoFusion room4 synthetic sequence.
set -e
mkdir -p Datasets/CoFusion
cd Datasets/CoFusion
wget http://visual.cs.ucl.ac.uk/pubs/cofusion/data/room4-full.tar.gz
tar -xzf room4-full.tar.gz
