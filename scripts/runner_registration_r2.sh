#!/bin/bash
# Round-2 registration quality experiment (multi-class procedural, best-val
# PCRNet, --iterations 2): phase 1 trains PCRNet on full clouds and reports
# full-cloud + FPS-sampled baselines; phase 2 trains SampleNet against the
# frozen PCRNet. VERDICT round-1 items: multi-class task pressure, longer
# PCRNet training, iterative refinement.
set -e
OUT=${OUT:-log/reg_r2}
EPOCHS_PCR=${EPOCHS_PCR:-150}
EPOCHS_SN=${EPOCHS_SN:-150}
ITER=${ITER:-2}
COMMON=(--train-size "${TRAIN:-2048}" --test-size "${TEST:-512}"
        --batch-size 32 --num-points "${N:-1024}" --num-out-points "${M:-64}"
        --iterations "$ITER")
python -m samplenet_tpu.train.train_registration --phase pcrnet \
    --epochs "$EPOCHS_PCR" "${COMMON[@]}" --log-dir "$OUT/pcrnet"
python -m samplenet_tpu.train.train_registration --phase samplenet \
    --epochs "$EPOCHS_SN" "${COMMON[@]}" \
    --pcrnet-ckpt "$OUT/pcrnet/ckpt" --log-dir "$OUT/samplenet"
