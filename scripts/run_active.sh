#!/bin/bash
# Active-learning sweep over per-noise-type subdirectories
# (rebuild of the reference's run_active.sh experiment driver): for each
# noise type, launch training with dual upstream checkpoints
# (noisy->clean + noisy->noise), a pretrained BLSTM warm start, raw-feature
# input, and the async + sync active sampler.
#
# Usage: scripts/run_active.sh NOISE_ROOT CKPT_N2C CKPT_N2N DCKPT EXPROOT

set -euo pipefail
noise_root=${1:?noise root dir}
ckpt_n2c=${2:?noisy->clean upstream ckpt}
ckpt_n2n=${3:?noisy->noise upstream ckpt}
dckpt=${4:?downstream warm-start ckpt}
exproot=${5:-result/active}

for noise_dir in "$noise_root"/*/; do
    noise_name=$(basename "$noise_dir")
    python run_downstream.py \
        --name "active_${noise_name}" \
        --expdir "$exproot" \
        --config config/active.yaml \
        --ckpt "$ckpt_n2c" --ckpt2 "$ckpt_n2n" \
        --dckpt "$dckpt" \
        --downstream LSTM --objective L1 \
        --from_rawfeature \
        --active_sampling --sync_sampler --eval_init --save_best \
        --test_noise "$noise_dir"
done
