#!/bin/bash
# Round-3 heavy-corruption robustness study (VERDICT r2 item 5): the
# beyond-reference softassign loss claims its regime is heavy corruption —
# validate it there or demote it. Epoch-matched AE + sampler phases for
# loss in {chamfer, emd, softassign} under gaussian sigma in {0.05, 0.1}
# and 10% uniform-outlier contamination; score = denoising NRE (noisy in,
# clean target). Aggregate with:
#   python benchmarks/softassign_study.py log/softassign_r3
set -e
OUT=${OUT:-log/softassign_r3}
EPOCHS=${EPOCHS:-100}
COMMON=(--num-points 2048 --batch-size 50 --train-size "${TRAIN:-500}"
        --test-size "${TEST:-100}" --num-out-points 64 --epochs "$EPOCHS")
run_config () {  # $1 tag, $2 loss, extra corruption flags in "$@"
    local TAG=$1 LOSS=$2; shift 2
    python -m samplenet_tpu.train.train_reconstruction --phase ae \
        --loss "$LOSS" "${COMMON[@]}" "$@" --log-dir "$OUT/$TAG/ae"
    python -m samplenet_tpu.train.train_reconstruction --phase samplenet \
        "${COMMON[@]}" "$@" --ae-ckpt "$OUT/$TAG/ae/ckpt" \
        --log-dir "$OUT/$TAG/sn"
}
for LOSS in chamfer emd softassign; do
    run_config "sigma05_$LOSS" "$LOSS" --denoising-sigma 0.05
    run_config "sigma10_$LOSS" "$LOSS" --denoising-sigma 0.10
    run_config "outlier10_$LOSS" "$LOSS" --outlier-ratio 0.10
done
