#!/bin/bash
# Round-4 quality corpus (VERDICT r3 next #3): three analytic scenes of
# increasing difficulty, trained on the full reference 30k schedule and
# scored with the reference protocol (render.py + metrics.py) at 7k AND 30k
# on held-out views.  Per-scene ablation columns:
#   spheres — defaults (anchor vs the round-3 gate run)
#   thicket — --antialiasing + depth regularization from analytically exact
#             inverse-depth GT (-d depths)
#   glossy  — exposure-jittered train images recovered through --use_expcomp
#             (exposure LR schedule + train_test_exp, reference
#             full_eval.py:55-56)
# GT: utils/synthetic_dataset raytracer (numpy<->jax parity tested); nothing
# in GT generation touches the renderer under test.  Results land IN-REPO
# under results/ (round-3 ADVICE: artifacts must be auditable).
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
export GS_BATCH_CACHE_GB=8
cd /root/repo
mkdir -p results

run_scene () {
  local NAME=$1; shift
  local EXTRA="$@"
  local DATA=/root/data/analytic_${NAME}
  local OUT=/root/runs/corpus_${NAME}
  echo "=== ${NAME}: train ==="
  python train.py -s "$DATA" -m "$OUT" -w --eval --disable_viewer \
    --capacity 262144 \
    --test_iterations 1000 7000 15000 30000 \
    --save_iterations 7000 30000 $EXTRA 2>&1 | tee results/${NAME}_train.log | tail -40
  for IT in 7000 30000; do
    echo "=== ${NAME}: render+metrics @ $IT ==="
    python render.py -m "$OUT" --skip_train --iteration $IT
    python metrics.py -m "$OUT"
  done
  cp "$OUT/results.json" results/${NAME}_results.json
  python - "$NAME" "$OUT" <<'PY'
import json, sys
name, out = sys.argv[1], sys.argv[2]
with open(f"{out}/results.json") as f:
    print(name, json.dumps(json.load(f), indent=1)[:400])
PY
}

case "${1:-all}" in
  spheres) run_scene spheres ;;
  thicket) run_scene thicket --antialiasing -d depths ;;
  glossy)  run_scene glossy --train_test_exp \
             --exposure_lr_init 0.001 --exposure_lr_final 0.0001 \
             --exposure_lr_delay_steps 5000 --exposure_lr_delay_mult 0.001 ;;
  all)
    bash "$0" spheres
    bash "$0" thicket
    bash "$0" glossy
    ;;
esac
