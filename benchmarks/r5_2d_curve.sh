#!/bin/bash
# Round-5 2D quality-vs-compute curve work queue (VERDICT r4 item 1a):
# train the 1k and 5k air_balloons points, then generate rec+rand sample
# sets for all three points (1k/5k/50k).  SIFID scoring happens in ONE
# benchmarks/sifid_multiimage.py invocation afterward (same trunk for the
# whole column, mirroring the 3D svfid_multiclip protocol).
# TPU runs are strictly serial (CLAUDE.md: two at once corrupt each other).
#
# Relay wedges are EXPECTED on this tunnel (a fresh one hit this queue's
# first 1k attempt at scale 1 iter 40): each train runs under --watchdog,
# and on a nonzero exit the queue retries up to 3x, resuming from the
# newest experiment's netG_mid when one exists (bit-exact resume,
# tests/test_save_interval.py) or fresh otherwise.
set -u
cd "$(dirname "$0")/.."
IMG=/root/reference/data/imgs/air_balloons.jpg

train_with_retry() { # $1 = niter
  local NITER=$1 CHECK="soak$1" attempt resume midckpt
  for attempt in 1 2 3; do
    resume=""
    midckpt="$(ls -d run/air_balloons/$CHECK/experiment_* 2>/dev/null \
               | sort -V | tail -1)/netG_mid"
    [ -f "$midckpt" ] && resume="--netG $midckpt"
    echo "== train $CHECK attempt $attempt ${resume:+(resume)} =="
    python train_image.py --image-path "$IMG" --img-size 248 \
        --niter "$NITER" --fast-grads --bf16 --scan-steps 10 \
        --watchdog 900 --save-interval 1000 --manualSeed 42 \
        --checkname "$CHECK" $resume
    rc=$?
    [ "$rc" -eq 0 ] && return 0
    echo "== train $CHECK attempt $attempt FAILED (rc=$rc) =="
    sleep 20
  done
  return 1
}

train_with_retry 1000 || exit 1
train_with_retry 5000 || exit 1

for NITER in 1000 5000 50000; do
  CHECK="soak${NITER}"
  CKPT="$(ls -d run/air_balloons/$CHECK/experiment_* | sort -V | tail -1)/netG"
  OUT="run/air_balloons/$CHECK/curve_eval"
  echo "== $CHECK rec metrics ($CKPT) =="
  python generate.py --netG "$CKPT" --mode rec --metrics --num-samples 2 \
    --manualSeed 1 --output-dir "$OUT" || exit 1
  echo "== $CHECK rand metrics =="
  python generate.py --netG "$CKPT" --mode rand --metrics --num-samples 6 \
    --manualSeed 1 --output-dir "$OUT" || exit 1
done
echo "R5_2D_CURVE_DONE"
