#!/bin/bash
# Full-schedule quality run against ANALYTIC ground truth (round-3 gate).
#
# The round-2 quality run's GT was rendered by this framework's own
# rasterizer from a random Gaussian soup — any renderer bias cancels and the
# surface-free GT generalizes poorly to held-out views by construction
# (VERDICT round 2, "What's missing" #1).  This run replaces it: GT comes
# from utils/synthetic_dataset.generate_analytic_dataset — a pure-numpy
# raytracer over textured opaque geometry (spheres + checkered disk, hard
# shadows, supersampled AA).  Nothing in GT generation touches the code
# under test, matching the regime of the reference's NeRF-synthetic
# benchmark (reference full_eval.py:62-79, train at -w like lego et al.).
#
# Protocol: 120 train / 12 test views at 800x600, white background, full
# 30k schedule (densify 500-15k/100, opacity reset every 3k), then
# render.py + metrics.py on the held-out split.
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
# hold all train cameras' pixels in HBM: a cache miss re-uploads the image
# through the axon tunnel (~1.5 s) EVERY step
export GS_BATCH_CACHE_GB=8
cd /root/repo

DATA=${DATA:-/root/data/analytic800}
OUT=${OUT:-/root/runs/qa30k}

if [ ! -f "$DATA/transforms_train.json" ]; then
  python - <<'EOF'
from gaussian_splatting_tpu.utils.synthetic_dataset import generate_analytic_dataset
generate_analytic_dataset(
    "/root/data/analytic800",
    num_train=120, num_test=12,
    width=800, height=600,
    seed=0, supersample=2,
)
print("analytic dataset done")
EOF
fi

python train.py -s "$DATA" -m "$OUT" -w --eval \
  --disable_viewer \
  --capacity 262144 \
  --test_iterations 1000 7000 15000 30000 \
  --save_iterations 7000 30000 \
  --checkpoint_iterations 30000

python render.py -m "$OUT" --skip_train
python metrics.py -m "$OUT"
