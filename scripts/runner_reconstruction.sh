#!/bin/bash
# Reconstruction pipeline (reconstruction/runner_*.sh flow):
# train AE -> train sampler against frozen AE -> NRE reported per epoch.
set -e
OUT=${OUT:-log}
python -m samplenet_tpu.train.train_reconstruction --phase ae \
    --epochs "${EPOCHS_AE:-50}" --log-dir "$OUT/ae"
python -m samplenet_tpu.train.train_reconstruction --phase samplenet \
    --epochs "${EPOCHS_SN:-50}" --ae-ckpt "$OUT/ae/ckpt" \
    --num-out-points "${M:-64}" --log-dir "$OUT/recon_samplenet"
