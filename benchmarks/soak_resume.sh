#!/bin/bash
# Resumable NITER-iters/scale wingsuit soak (NEXT.md r4 item 1).
#
# Wraps the wingsuit_curve.sh training step in a resume loop: any nonzero
# exit (watchdog exit-75 on a wedged relay, transient relay errors) is
# retried from the newest intra-scale checkpoint (netG_mid, bit-exact
# resume — tests/test_save_interval.py).  Each retry lands in a fresh
# experiment_N dir; the newest netG_mid across ALL experiment dirs is the
# resume point, so a crash before the first save of a retry falls back to
# the previous attempt's checkpoint.
#
#   setsid nohup env NITER=10000 bash benchmarks/soak_resume.sh \
#     > /tmp/wingsuit_10k_r4.log 2>&1 & echo $! > /tmp/soak.pid
#
# Eval (rec/rand metrics + multi-clip SVFID) is run separately against the
# finishing experiment's netG — the experiment id is not fixed under
# resume, so the wingsuit_curve.sh hardcoded experiment_0 eval is wrong
# here.
set -u
cd "$(dirname "$0")/.."
NITER=${NITER:-10000}
CHECK="soak${NITER}"
BASE="run/wingsuit/$CHECK"
MAX_RETRY=${MAX_RETRY:-12}

for attempt in $(seq 0 "$MAX_RETRY"); do
  CKPT=$(ls -t "$BASE"/experiment_*/netG_mid 2>/dev/null | head -1)
  EXTRA=""
  [ -n "$CKPT" ] && EXTRA="--netG $CKPT"
  echo "== attempt $attempt resume='${CKPT:-fresh}' =="
  python train_video.py --video-path data/vids/wingsuit.avi --img-size 256 \
    --niter "$NITER" --fast-grads --bf16 --scan-steps 10 --pconv \
    --watchdog 1800 --save-interval 1000 --manualSeed 42 \
    --checkname "$CHECK" $EXTRA
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "== training complete =="
    exit 0
  fi
  echo "== exit $rc; retrying from newest netG_mid =="
  sleep 10
done
echo "== giving up after $MAX_RETRY retries =="
exit 1
