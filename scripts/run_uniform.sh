#!/bin/bash
# Uniform-sampling baseline sweep over per-noise-type subdirectories
# (rebuild of the reference's run_uniform.sh): same setup as run_active.sh
# but without active sampling — the control arm of the experiment.
#
# Usage: scripts/run_uniform.sh NOISE_ROOT CKPT_N2C CKPT_N2N DCKPT EXPROOT

set -euo pipefail
noise_root=${1:?noise root dir}
ckpt_n2c=${2:?noisy->clean upstream ckpt}
ckpt_n2n=${3:?noisy->noise upstream ckpt}
dckpt=${4:?downstream warm-start ckpt}
exproot=${5:-result/uniform}

for noise_dir in "$noise_root"/*/; do
    noise_name=$(basename "$noise_dir")
    python run_downstream.py \
        --name "uniform_${noise_name}" \
        --expdir "$exproot" \
        --config config/pseudo_noise.yaml \
        --ckpt "$ckpt_n2c" --ckpt2 "$ckpt_n2n" \
        --dckpt "$dckpt" \
        --downstream LSTM --objective L1 \
        --from_rawfeature \
        --eval_init --save_best \
        --test_noise "$noise_dir"
done
