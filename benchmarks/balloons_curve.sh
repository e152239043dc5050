#!/bin/bash
# 2D quality-vs-compute curve on the reference's canonical demo image
# (air_balloons.jpg, 186x248) — the 2D counterpart of wingsuit_curve.sh.
# The reference's own default envelope is 50,000 iters/scale
# (/root/reference/train_image.py:303 `--niter` default); NITER=50000
# trains that FULL default workload end-to-end on one chip (~2 h wall —
# the reference needs ~46 days for the same schedule on this host's CPU).
#   NITER=50000 bash benchmarks/balloons_curve.sh
# Artifacts: run/air_balloons/soak<NITER>/experiment_N (+ eval samples);
# the metrics steps resolve the NEWEST experiment dir (the saver
# auto-increments N per run, utils/saver.py).
set -eu
cd "$(dirname "$0")/.."
NITER=${NITER:-5000}
CHECK="soak${NITER}"
EXTRA=${EXTRA:-}
IMG=${IMG:-/root/reference/data/imgs/air_balloons.jpg}

python train_image.py --image-path "$IMG" --img-size 248 \
  --niter "$NITER" --fast-grads --bf16 --scan-steps 10 \
  --watchdog 1200 --save-interval 2000 --manualSeed 42 \
  --checkname "$CHECK" $EXTRA

CKPT="$(ls -d run/air_balloons/$CHECK/experiment_* | sort -V | tail -1)/netG"
echo "== rec metrics ($CKPT) =="
python generate.py --netG "$CKPT" --image-path "$IMG" --img-size 248 \
  --mode rec --metrics --num-samples 2 --manualSeed 1
echo "== rand metrics =="
python generate.py --netG "$CKPT" --image-path "$IMG" --img-size 248 \
  --mode rand --metrics --num-samples 6 --manualSeed 1
