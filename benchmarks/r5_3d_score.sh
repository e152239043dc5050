#!/bin/bash
# Score the round-5 wingsuit knee point: generate rec+rand sample sets
# from the newest soak checkpoint (end-of-scale netG if the run
# completed, else the full-geometry netG_mid of an interrupted top
# scale), then run the n=6 multiclip SVFID protocol (fixed-seed random
# C3D; same trunk seed + real-clip decode as the r3/r4 curve column —
# cross-invocation comparable, with the usual random-trunk caveats).
# Run AFTER the training process has been killed (serial TPU rule).
set -eu
cd "$(dirname "$0")/.."
CHECK=${CHECK:-soak20000}
EXP="$(ls -d run/wingsuit/$CHECK/experiment_* | sort -V | tail -1)"
CKPT="$EXP/netG"
# prefer the mid checkpoint when it is NEWER than the last end-of-scale
# save (an interrupted scale has fresher full-geometry weights)
if [ -f "$EXP/netG_mid" ] && [ "$EXP/netG_mid" -nt "$CKPT" ]; then
  CKPT="$EXP/netG_mid"
fi
OUT="run/wingsuit/$CHECK/curve_eval"
echo "== scoring $CKPT =="
python generate.py --netG "$CKPT" --mode rec --metrics --num-samples 2 \
  --manualSeed 1 --output-dir "$OUT"
python generate.py --netG "$CKPT" --mode rand --metrics --num-samples 6 \
  --manualSeed 1 --output-dir "$OUT"
python benchmarks/svfid_multiclip.py --clip \
  "name=wingsuit_${CHECK},video_path=data/vids/wingsuit.avi,samples_glob=$OUT/sample_*.avi"
echo "R5_3D_SCORE_DONE"
