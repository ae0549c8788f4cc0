#!/bin/bash
# Registration pipeline (registration/runner_samplenet.sh flow):
# train PCRNet on full clouds -> train SampleNet against frozen PCRNet.
set -e
OUT=${OUT:-log}
python -m samplenet_tpu.train.train_registration --phase pcrnet \
    --epochs "${EPOCHS_PCR:-30}" --log-dir "$OUT/pcrnet"
python -m samplenet_tpu.train.train_registration --phase samplenet \
    --epochs "${EPOCHS_SN:-50}" --pcrnet-ckpt "$OUT/pcrnet/ckpt" \
    --num-out-points "${M:-64}" --log-dir "$OUT/registration_samplenet"
