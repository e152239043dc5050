#!/bin/bash
# Quality-vs-compute curve on the paper's wingsuit clip (VERDICT r3 item 6):
# train the full default pyramid at NITER iters/scale with the fast stack,
# then evaluate rec-PSNR, rand diversity, and relative SVFID.
#   NITER=1000 bash benchmarks/wingsuit_curve.sh
# Artifacts: run/wingsuit/soak<NITER>/experiment_N (+ eval samples, logs);
# the metrics steps resolve the NEWEST experiment dir (the saver
# auto-increments N per run, utils/saver.py).
set -eu
cd "$(dirname "$0")/.."
NITER=${NITER:-1000}
CHECK="soak${NITER}"
EXTRA=${EXTRA:-}

python train_video.py --video-path data/vids/wingsuit.avi --img-size 256 \
  --niter "$NITER" --fast-grads --bf16 --scan-steps 10 --pconv \
  --watchdog 1800 --save-interval 1000 --manualSeed 42 \
  --checkname "$CHECK" $EXTRA

CKPT="$(ls -d run/wingsuit/$CHECK/experiment_* | sort -V | tail -1)/netG"
echo "== rec metrics ($CKPT) =="
python generate.py --netG "$CKPT" --mode rec --metrics --num-samples 2 \
  --manualSeed 1
echo "== rand metrics + svfid =="
python generate.py --netG "$CKPT" --mode rand --metrics --svfid \
  --num-samples 6 --manualSeed 1
