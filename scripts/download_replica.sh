#!/bin/bash
# Download the Replica SLAM sequences (pre-rendered RGB-D trajectories, the
# same data the reference fetches in its scripts/download_replica.sh).
set -e
mkdir -p Datasets
cd Datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
