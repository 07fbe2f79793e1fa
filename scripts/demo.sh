#!/usr/bin/env bash
# Train + test the three headline HAR models, mirroring the reference demo
# (`/root/reference/rnn_compression_factorization_vmlmf/script/demo.sh:1-10`:
# mylstm, vmmodel w8/u6, vmlmf_group2 w8/u[2,4] at layer 180 seed 3).
# Uses --synthetic when no dataset folder is given; pass a folder with $1.
set -e
cd "$(dirname "$0")/.."
EPOCHS="${EPOCHS:-1}"
# pallas = measured-fastest backend at this config (BASELINE.md); numerics match xla
BACKEND="${BACKEND:-pallas}"
DATA_ARGS="--synthetic"
if [ -n "$1" ]; then DATA_ARGS="--dataset_folder $1"; fi

python -m vmlmf_tpu.cli.har_main --total --max_epochs $EPOCHS --model mylstm        --layer_sizes 180 --seed 3 --backend $BACKEND $DATA_ARGS
python -m vmlmf_tpu.cli.har_main --total --max_epochs $EPOCHS --model vmmodel       --layer_sizes 180 --wRank 8 --uRanks 6   --seed 3 --backend $BACKEND $DATA_ARGS
python -m vmlmf_tpu.cli.har_main --total --max_epochs $EPOCHS --model vmmodel_group2 --layer_sizes 180 --wRank 8 --uRanks 2 4 --seed 3 --backend $BACKEND $DATA_ARGS
