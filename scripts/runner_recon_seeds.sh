#!/usr/bin/env bash
# Multi-seed reconstruction quality study (BENCHMARKS.md "Multi-seed
# reconstruction study"; aggregated by benchmarks/recon_seeds.py).
#
# 3 fully independent seeds — fresh procedural split + fresh init per
# seed (--seed k drives both make_dataset and the PRNGKey) — each:
#   phase ae       : 2048-pt chamfer AE, 100 epochs, B=50, 500/100 split
#   phase samplenet: m-point sampler vs that seed's frozen AE, 100 epochs,
#                    + the in-CLI FPS-baseline NRE through the same AE
# Mirrors the registration (r4) and classification (r5) multi-seed
# protocols (docs/EVAL_PROTOCOL.md). Reference comparison point:
# reconstruction/sampler/evaluate_samplenet.py (NRE vs FPS via one AE).
#
#   bash scripts/runner_recon_seeds.sh [root=log/recq_r5] [ms="64 32"]
set -u
ROOT="${1:-log/recq_r5}"
MS="${2:-64 32}"
for SEED in 0 1 2; do
  SD="$ROOT/seed$SEED"
  if [ ! -d "$SD/ae/ckpt" ]; then
    echo "=== seed $SEED: AE phase ==="
    timeout 2700 python -m samplenet_tpu.train.train_reconstruction \
      --phase ae --loss chamfer --epochs 100 --batch-size 50 \
      --num-points 2048 --train-size 500 --test-size 100 \
      --seed "$SEED" --log-dir "$SD/ae" || echo "AE seed$SEED FAILED rc=$?"
  fi
  for M in $MS; do
    [ -d "$SD/sn$M" ] && [ -n "$(grep -l 'FPS baseline' "$SD/sn$M"/log_samplenet.txt 2>/dev/null)" ] && continue
    echo "=== seed $SEED: SampleNet m=$M ==="
    timeout 2700 python -m samplenet_tpu.train.train_reconstruction \
      --phase samplenet --epochs 100 --batch-size 50 \
      --num-points 2048 --train-size 500 --test-size 100 \
      --num-out-points "$M" --fps-baseline \
      --ae-ckpt "$SD/ae/ckpt" --seed "$SEED" --log-dir "$SD/sn$M" \
      || echo "sn$M seed$SEED FAILED rc=$?"
  done
done
echo "=== aggregate ==="
python benchmarks/recon_seeds.py "$ROOT"
