#!/bin/bash
# Round-3 registration statistics (VERDICT r2 item 3): >=3 seeds for both
# phases at m in {16, 32, 64}, so the SampleNet-vs-FPS ordering is a
# claim across seeds rather than one draw. Each seed is a fully
# independent run (fresh procedural data split AND fresh init). Phase 1
# also evaluates the FPS baseline at every m against its own PCRNet.
# Aggregate with: python benchmarks/registration_seeds.py log/reg_r3
set -e
OUT=${OUT:-log/reg_r3}
SEEDS=${SEEDS:-0 1 2}
MS=${MS:-16 32 64}
EPOCHS_PCR=${EPOCHS_PCR:-150}
EPOCHS_SN=${EPOCHS_SN:-150}
# --no-fused-train: pin the XLA train chain so every seed trains the
# identical program regardless of the repo's default (the round-4 flip
# to auto exact-fused landed between seeds of the r4 study).
COMMON=(--train-size "${TRAIN:-2048}" --test-size "${TEST:-512}"
        --batch-size 32 --num-points "${N:-1024}" --no-fused-train)
for SEED in $SEEDS; do
    python -m samplenet_tpu.train.train_registration --phase pcrnet \
        --epochs "$EPOCHS_PCR" "${COMMON[@]}" --seed "$SEED" \
        --num-out-points 64 --fps-eval-sizes "16,32,64" \
        --log-dir "$OUT/seed$SEED/pcrnet"
    for M in $MS; do
        python -m samplenet_tpu.train.train_registration --phase samplenet \
            --epochs "$EPOCHS_SN" "${COMMON[@]}" --seed "$SEED" \
            --num-out-points "$M" \
            --pcrnet-ckpt "$OUT/seed$SEED/pcrnet/ckpt" \
            --log-dir "$OUT/seed$SEED/samplenet$M"
    done
done
