#!/bin/bash
# 2D quality-vs-compute curve on the reference's canonical demo image
# (air_balloons.jpg, 186x248) — the 2D counterpart of wingsuit_curve.sh.
# The reference's own default envelope is 50,000 iters/scale
# (/root/reference/train_image.py:289-equivalent default); NITER=50000
# trains that FULL default workload end-to-end on one chip (~2 h wall —
# the reference needs ~46 days for the same schedule on this host's CPU).
#   NITER=50000 bash benchmarks/balloons_curve.sh
# Artifacts: run/air_balloons/soak<NITER>/experiment_0 (+ eval samples).
set -u
cd "$(dirname "$0")/.."
NITER=${NITER:-5000}
CHECK="soak${NITER}"
EXTRA=${EXTRA:-}
IMG=${IMG:-/root/reference/data/imgs/air_balloons.jpg}

python train_image.py --image-path "$IMG" --img-size 248 \
  --niter "$NITER" --fast-grads --bf16 --scan-steps 10 \
  --watchdog 1200 --save-interval 2000 --manualSeed 42 \
  --checkname "$CHECK" $EXTRA || exit $?

CKPT="run/air_balloons/$CHECK/experiment_0/netG"
echo "== rec metrics =="
python generate.py --netG "$CKPT" --image-path "$IMG" --img-size 248 \
  --mode rec --metrics --num-samples 2 --manualSeed 1
echo "== rand metrics =="
python generate.py --netG "$CKPT" --image-path "$IMG" --img-size 248 \
  --mode rand --metrics --num-samples 6 --manualSeed 1
