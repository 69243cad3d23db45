#!/bin/bash
# Fetch the pretrained ConvONet decoder checkpoints (coarse.pt,
# middle_fine.pt) from the upstream NICE-SLAM release; run.py imports the
# torch weights into our parameter pytrees at startup.
set -e
mkdir -p pretrained
cd pretrained
wget https://github.com/cvg/nice-slam/raw/master/pretrained/coarse.pt
wget https://github.com/cvg/nice-slam/raw/master/pretrained/middle_fine.pt
