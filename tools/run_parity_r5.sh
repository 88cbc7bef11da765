#!/bin/bash
# Round-5 parity evidence pack (VERDICT r4 #5): execute all five BASELINE
# parity harnesses ON THE REAL TPU (they had only ever run as CPU CI
# proxies) and save each JSON verdict into docs/parity_runs/r5/.
# Synthetic (--synthetic) because no real dataset exists in this
# environment; real data remains a --data flag change.
set -u
cd "$(dirname "$0")/.."
OUT=docs/parity_runs/r5
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name: python -m mccnn_tpu.tasks.parity $*" >&2
  timeout 2400 python -m mccnn_tpu.tasks.parity "$@" 2>"$OUT/$name.log" \
    | tail -1 > "$OUT/$name.json"
  echo "--- $name: $(cat "$OUT/$name.json")" >&2
}

COMMON="--synthetic --eval-every 5 --log-dir logs/parity_r5"

# 1. ModelNet classification (MCClassS, voting eval)
run modelnet $COMMON --epochs 30 --batch 32 --points 1024 --grow 16 \
    --votes 8 --ckpt-dir ckpts/parity_r5_modelnet
# 2. Non-uniform robustness: train once, eval all five protocols (MCClassH)
run modelnet_protocols $COMMON --epochs 30 --batch 32 --points 1024 \
    --grow 16 --votes 4 --model MCClassH --sweep-protocols \
    --ckpt-dir ckpts/parity_r5_protocols
# 3. ShapeNet part segmentation (MCSeg + category one-hot)
run shapenet --task shapenet $COMMON --epochs 12 --batch 16 --points 1024 \
    --grow 16 --ckpt-dir ckpts/parity_r5_shapenet
# 4. ScanNet scene segmentation (block pipeline; 4096 pts exercises the
#    tile auto-dispatch on the real chip)
run scannet --task scannet $COMMON --epochs 6 --batch 8 --points 4096 \
    --grow 16 --ckpt-dir ckpts/parity_r5_scannet
# 5. Normal estimation (MCNorm, angular loss)
run normals --task normals $COMMON --epochs 12 --batch 16 --points 1024 \
    --grow 16 --ckpt-dir ckpts/parity_r5_normals

echo "done; verdicts in $OUT" >&2
