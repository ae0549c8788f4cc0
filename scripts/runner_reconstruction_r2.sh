#!/bin/bash
# Round-2 reconstruction quality experiment: clean AE -> SampleNet NRE, then
# the denoising variant (noisy input vs clean target, 2w chamfer weighting)
# -> NRE-noisy. Rows land in BENCHMARKS.md.
set -e
OUT=${OUT:-log/recon_r2}
EPOCHS_AE=${EPOCHS_AE:-100}
EPOCHS_SN=${EPOCHS_SN:-100}
M=${M:-64}
SIGMA=${SIGMA:-0.02}
COMMON=(--train-size "${TRAIN:-2048}" --test-size "${TEST:-512}"
        --num-points "${N:-2048}")

python -m samplenet_tpu.train.train_reconstruction --phase ae \
    --epochs "$EPOCHS_AE" "${COMMON[@]}" --log-dir "$OUT/ae"
python -m samplenet_tpu.train.train_reconstruction --phase samplenet \
    --epochs "$EPOCHS_SN" "${COMMON[@]}" --num-out-points "$M" \
    --ae-ckpt "$OUT/ae/ckpt" --log-dir "$OUT/samplenet"

python -m samplenet_tpu.train.train_reconstruction --phase ae \
    --epochs "$EPOCHS_AE" "${COMMON[@]}" --denoising-sigma "$SIGMA" \
    --log-dir "$OUT/ae_denoise"
python -m samplenet_tpu.train.train_reconstruction --phase samplenet \
    --epochs "$EPOCHS_SN" "${COMMON[@]}" --num-out-points "$M" \
    --denoising-sigma "$SIGMA" --ae-ckpt "$OUT/ae_denoise/ckpt" \
    --log-dir "$OUT/samplenet_denoise"
