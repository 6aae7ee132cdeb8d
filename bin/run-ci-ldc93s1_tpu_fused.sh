#!/bin/sh
# CI gate (real-accelerator variant): train with the fused Pallas LSTM
# training kernels engaged (batch 8, bf16, n_cell_dim % 128 == 0 so the
# custom_vjp fwd+bwd kernels run, stt_tpu/ops/lstm_train.py), then assert
# the exact smoke transcript at test time. On a CPU-only host the config
# gates fall back to the lax.scan and the gate still holds.
#
# Verified on a single TPU v5e: WER 0.000000, exact transcript.
set -xe

epochs="${1:-200}"
work="${work:-/tmp/ci_ldc93s1_tpu_fused}"
smoke="${smoke:-/root/reference/data/smoke_test}"
alphabet="${alphabet:-/root/reference/data/alphabet.txt}"
expected="she had your dark suit in greasy wash water all year"

rm -rf "$work"; mkdir -p "$work"

# batch 8 of the same utterance: the smallest batch the fused-train
# guard accepts (batch % 8 == 0)
{
  echo "wav_filename,wav_filesize,transcript"
  for i in 1 2 3 4 5 6 7 8; do
    echo "$smoke/LDC93S1.wav,93638,$expected"
  done
} > "$work/ldc93s1_x8.csv"

python -m stt_tpu.train \
    --train_files "$work/ldc93s1_x8.csv" \
    --dev_files "$work/ldc93s1_x8.csv" \
    --alphabet_config_path "$alphabet" \
    --checkpoint_dir "$work/ckpt" \
    --n_hidden 128 --epochs "$epochs" --learning_rate 0.002 \
    --train_batch_size 8 --compute_dtype bfloat16

python -m stt_tpu.evaluate \
    --test_files "$smoke/ldc93s1.csv" \
    --checkpoint_dir "$work/ckpt" \
    --alphabet_config_path "$alphabet" \
    --n_hidden 128 \
    --test_output_file "$work/test_output.json"

python - "$work/test_output.json" "$expected" <<'EOF'
import json, sys
samples = json.load(open(sys.argv[1]))
res = samples[0]["res"]
assert res == sys.argv[2], f"transcript mismatch: {res!r}"
print("fused-train smoke transcript OK")
EOF
