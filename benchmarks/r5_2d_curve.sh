#!/bin/bash
# Round-5 2D quality-vs-compute curve work queue (VERDICT r4 item 1a):
# train the 1k and 5k air_balloons points, then generate rec+rand sample
# sets for all three points (1k/5k/50k).  SIFID scoring happens in ONE
# benchmarks/sifid_multiimage.py invocation afterward (same trunk for the
# whole column, mirroring the 3D svfid_multiclip protocol).
# TPU runs are strictly serial (CLAUDE.md: two at once corrupt each other).
set -eu
cd "$(dirname "$0")/.."
IMG=/root/reference/data/imgs/air_balloons.jpg

for NITER in 1000 5000; do
  CHECK="soak${NITER}"
  python train_image.py --image-path "$IMG" --img-size 248 \
    --niter "$NITER" --fast-grads --bf16 --scan-steps 10 \
    --watchdog 1200 --save-interval 2000 --manualSeed 42 \
    --checkname "$CHECK"
done

for NITER in 1000 5000 50000; do
  CHECK="soak${NITER}"
  CKPT="$(ls -d run/air_balloons/$CHECK/experiment_* | sort -V | tail -1)/netG"
  OUT="run/air_balloons/$CHECK/curve_eval"
  echo "== $CHECK rec metrics ($CKPT) =="
  python generate.py --netG "$CKPT" --mode rec --metrics --num-samples 2 \
    --manualSeed 1 --output-dir "$OUT"
  echo "== $CHECK rand metrics =="
  python generate.py --netG "$CKPT" --mode rand --metrics --num-samples 6 \
    --manualSeed 1 --output-dir "$OUT"
done
echo "R5_2D_CURVE_DONE"
