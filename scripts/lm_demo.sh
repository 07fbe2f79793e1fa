#!/usr/bin/env bash
# PTB language-model runs, mirroring the reference protocol
# (`/root/reference/rnn_compression_factorization_vmlmf/src/train_test/lm_test.py:40-80`):
# hidden 650 x 2 layers, dropout 0.5, batch 20, BPTT 35, SGD lr 1 with /1.2
# decay after epoch 6, clip 5, w=u=300 for the compressed variants.
# Synthetic corpus by default; pass a data dir containing ptb.{train,valid,test}.txt.
set -e
cd "$(dirname "$0")/.."
DATA_ARGS="--synthetic"
if [ -n "$1" ]; then DATA_ARGS="--data_dir $1"; fi
EPOCHS="${EPOCHS:-39}"
# pallas = measured-fastest backend at this config (BASELINE.md); numerics match xla
BACKEND="${BACKEND:-pallas}"

python -m vmlmf_tpu.cli.lm_main --lstm_type custom --total_epochs $EPOCHS --backend $BACKEND $DATA_ARGS
python -m vmlmf_tpu.cli.lm_main --lstm_type vmlmf  --wRank 300 --uRanks 300 --total_epochs $EPOCHS --backend $BACKEND $DATA_ARGS
python -m vmlmf_tpu.cli.lm_main --lstm_type vmgroup --wRank 300 --uRanks 300 150 --total_epochs $EPOCHS --backend $BACKEND $DATA_ARGS
