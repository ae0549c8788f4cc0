#!/bin/bash
# End-to-end classification pipeline (classification/runner_samplenet.sh flow):
# train task network -> train sampler against it -> evaluate -> dump clouds.
set -e
EPOCHS_CLS=${EPOCHS_CLS:-30}
EPOCHS_SN=${EPOCHS_SN:-50}
OUT=${OUT:-log}

python -m samplenet_tpu.train.train_classifier \
    --epochs "$EPOCHS_CLS" --log-dir "$OUT/classifier"

for M in 8 16 32 64; do
  python -m samplenet_tpu.train.train_samplenet \
      --epochs "$EPOCHS_SN" --num-out-points "$M" \
      --classifier-ckpt "$OUT/classifier/ckpt" \
      --log-dir "$OUT/samplenet$M"
  python -m samplenet_tpu.train.evaluate_cli samplenet \
      --ckpt "$OUT/samplenet$M/ckpt" --num-out-points "$M" \
      --classifier-ckpt "$OUT/classifier/ckpt" --log-dir "$OUT/eval"
done
