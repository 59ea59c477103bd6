#!/bin/bash
# Full-schedule quality run (BASELINE config-2 gate): synthetic 1600x1060
# scene, 100k random init points, 30k iterations with the full densify /
# opacity-reset schedule, PSNR at 1k/7k/15k/30k.
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
# hold all 100 cameras' pixels in HBM: a cache miss re-uploads ~40 MB
# through the axon tunnel (~1.5 s) EVERY step
export GS_BATCH_CACHE_GB=8
cd /root/repo

DATA=/root/data/synth1600
OUT=/root/runs/q30k

if [ ! -f "$DATA/transforms_train.json" ]; then
  python - <<'EOF'
from gaussian_splatting_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gaussian_splatting_tpu.utils.synthetic_dataset import generate_blender_dataset
generate_blender_dataset(
    "/root/data/synth1600",
    num_train=100, num_test=8,
    width=1600, height=1060,
    num_gaussians=30000,
    seed=3,
)
print("dataset done")
EOF
fi

# -r 2 trains at 800x530 (the reference's own MipNeRF protocol trains at
# images_2/images_4); full 30k schedule with densify + opacity resets
python train.py -s "$DATA" -m "$OUT" -r 2 \
  --disable_viewer \
  --capacity 262144 \
  --test_iterations 1000 7000 15000 30000 \
  --save_iterations 7000 30000 \
  --checkpoint_iterations 30000
