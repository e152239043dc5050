#!/bin/bash
# Round-5 3D wingsuit knee point (VERDICT r4 item 1b): the full default
# pyramid at NITER iters/scale with the fast stack, SUPERVISED — each
# watchdog kill / relay wedge is followed by a bit-exact resume from the
# newest experiment's netG_mid (tests/test_save_interval.py), up to
# MAX_ATTEMPTS.  NITER=20000 sized to the round-5 wall budget (~6.5 h;
# 25k-50k would not complete all 10 scales before the end-of-round
# bench, and a mid-pyramid kill yields no full-geometry point).
set -u
cd "$(dirname "$0")/.."
NITER=${NITER:-20000}
CHECK="soak${NITER}"
MAX_ATTEMPTS=${MAX_ATTEMPTS:-8}

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  resume=""
  midckpt="$(ls -d run/wingsuit/$CHECK/experiment_* 2>/dev/null \
             | sort -V | tail -1)/netG_mid"
  [ -f "$midckpt" ] && resume="--netG $midckpt"
  echo "== train $CHECK attempt $attempt ${resume:+(resume $midckpt)} =="
  python train_video.py --video-path data/vids/wingsuit.avi \
      --img-size 256 --niter "$NITER" --fast-grads --bf16 \
      --scan-steps 10 --pconv --watchdog 1500 --save-interval 1000 \
      --manualSeed 42 --checkname "$CHECK" $resume
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "R5_3D_SOAK_DONE"
    exit 0
  fi
  echo "== train $CHECK attempt $attempt FAILED (rc=$rc) =="
  sleep 30
done
echo "R5_3D_SOAK_GAVE_UP"
exit 1
