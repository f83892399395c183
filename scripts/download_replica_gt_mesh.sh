#!/bin/bash
# Ground-truth Replica meshes for 3D reconstruction evaluation
# (eval_recon -3d needs these; mirrors the reference's
# scripts/download_replica_mesh.sh).
set -e
mkdir -p Datasets/Replica_gt_mesh
cd Datasets/Replica_gt_mesh
wget https://cvg-data.inf.ethz.ch/nice-slam/cull_replica_mesh.zip
unzip cull_replica_mesh.zip
