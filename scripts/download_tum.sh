#!/bin/bash
# TUM RGB-D sequences used by configs/TUM_RGBD/*.yaml
# (mirrors the reference's scripts/download_tum.sh).
set -e
mkdir -p Datasets/TUM_RGBD
cd Datasets/TUM_RGBD
wget https://cvg.cit.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_desk.tgz
wget https://cvg.cit.tum.de/rgbd/dataset/freiburg2/rgbd_dataset_freiburg2_xyz.tgz
wget https://cvg.cit.tum.de/rgbd/dataset/freiburg3/rgbd_dataset_freiburg3_long_office_household.tgz
for f in *.tgz; do tar -xzf "$f"; done
