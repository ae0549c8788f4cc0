#!/bin/bash
# Progressive pipeline (classification/runner_samplenet_progressive.sh flow):
# train classifier -> train progressive sampler -> infer dumps -> prefix eval.
set -e
OUT=${OUT:-log}
python -m samplenet_tpu.train.train_classifier \
    --epochs "${EPOCHS_CLS:-30}" --log-dir "$OUT/classifier"
python -m samplenet_tpu.train.train_progressive \
    --epochs "${EPOCHS_PROG:-50}" --classifier-ckpt "$OUT/classifier/ckpt" \
    --max-num-out-points "${MAX_OUT:-256}" --log-dir "$OUT/progressive"
python -m samplenet_tpu.train.evaluate_cli infer \
    --ckpt "$OUT/progressive/ckpt" --out-dir "$OUT/dumps"
python -m samplenet_tpu.train.evaluate_cli from-files \
    --dump "$OUT/dumps/sampled/dump.h5" \
    --classifier-ckpt "$OUT/classifier/ckpt" --log-dir "$OUT/eval"
