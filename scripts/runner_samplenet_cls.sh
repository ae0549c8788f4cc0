#!/bin/bash
# End-to-end classification pipeline (classification/runner_samplenet.sh flow):
# train task network -> train sampler against it -> evaluate -> dump clouds.
#
# Real-data parity run (the moment a ModelNet40 drop lands):
#   python -m samplenet_tpu.data.ingest modelnet40 --data-dir data --strict
#   DATASET=modelnet40 DATA_DIR=data scripts/runner_samplenet_cls.sh
# Protocol details + pinned deviations: docs/EVAL_PROTOCOL.md
set -e
EPOCHS_CLS=${EPOCHS_CLS:-30}
EPOCHS_SN=${EPOCHS_SN:-50}
OUT=${OUT:-log}
DATASET=${DATASET:-procedural}
DATA_DIR=${DATA_DIR:-data}

python -m samplenet_tpu.train.train_classifier \
    --epochs "$EPOCHS_CLS" --dataset "$DATASET" --data-dir "$DATA_DIR" \
    --log-dir "$OUT/classifier"

for M in 8 16 32 64; do
  python -m samplenet_tpu.train.train_samplenet \
      --epochs "$EPOCHS_SN" --num-out-points "$M" \
      --dataset "$DATASET" --data-dir "$DATA_DIR" \
      --classifier-ckpt "$OUT/classifier/ckpt" \
      --log-dir "$OUT/samplenet$M"
  python -m samplenet_tpu.train.evaluate_cli samplenet \
      --ckpt "$OUT/samplenet$M/ckpt" --num-out-points "$M" \
      --dataset "$DATASET" --data-dir "$DATA_DIR" \
      --classifier-ckpt "$OUT/classifier/ckpt" --log-dir "$OUT/eval"
done
