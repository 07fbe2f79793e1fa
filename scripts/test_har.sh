#!/usr/bin/env bash
# Compression-rate-7 experiment grid, mirroring the legacy driver
# (`/root/reference/rnn_compression_factorization/test_HAR.sh:12-66`):
# dense 64x64 baseline vs low-rank (w9/u9) vs group low-rank (w9/u[12,6])
# on OPP and UCI, plus the DeepConv variants (dense 128 vs rank 19 vs
# group [28,10]).  Synthetic data by default; pass a dataset folder with $1.
set -e
cd "$(dirname "$0")/.."
EPOCHS="${EPOCHS:-1}"
DATA_ARGS="--synthetic"
if [ -n "$1" ]; then DATA_ARGS="--dataset_folder $1"; fi

for DATA in OPP UCI; do
  # dense baseline
  python -m vmlmf_tpu.cli.har_main --total --max_epochs $EPOCHS --model mylstm       --layer_sizes 64 64 --data $DATA $DATA_ARGS
  # plain low-rank
  python -m vmlmf_tpu.cli.har_main --total --max_epochs $EPOCHS --model mylstm       --layer_sizes 64 64 --wRank 9 --uRanks 9 --data $DATA $DATA_ARGS
  # group low-rank
  python -m vmlmf_tpu.cli.har_main --total --max_epochs $EPOCHS --model mylstm_group --layer_sizes 64 64 --wRank 9 --uRanks 12 6 --data $DATA $DATA_ARGS
done

# DeepConv variants (conv feature stack + compressed RNN)
python -m vmlmf_tpu.cli.har_main --total --max_epochs $EPOCHS --deepconv --model mylstm       --layer_sizes 128 --data UCI $DATA_ARGS
python -m vmlmf_tpu.cli.har_main --total --max_epochs $EPOCHS --deepconv --model mylstm       --layer_sizes 128 --wRank 19 --uRanks 19 --data UCI $DATA_ARGS
python -m vmlmf_tpu.cli.har_main --total --max_epochs $EPOCHS --deepconv --model mylstm_group --layer_sizes 128 --wRank 19 --uRanks 28 10 --data UCI $DATA_ARGS
