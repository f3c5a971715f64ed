#!/bin/bash
# Round-3 perf matrix on the production sampler (VERDICT r2 item 3):
# baseline vs transpose-free attention (bthd) vs bf16 denoise chain, on the
# reference's exact 100-step ancestral halfway path, plus the ddim50
# headline with the winning combination.  Run from /root/repo on the TPU.
set -e
cd "$(dirname "$0")/.."

echo "== halfway100 baseline (f32 chain, bhtd attention) =="
timeout 3600 python bench.py --mode halfway100
echo "== halfway100 + bthd attention =="
timeout 3600 python bench.py --mode halfway100 --attn_layout bthd
echo "== halfway100 + bf16 chain =="
timeout 3600 python bench.py --mode halfway100 --chain_dtype bfloat16
echo "== halfway100 + bthd + bf16 chain =="
timeout 3600 python bench.py --mode halfway100 --attn_layout bthd --chain_dtype bfloat16
echo "== halfway100 + bthd + bf16 chain + bf16 params =="
timeout 3600 python bench.py --mode halfway100 --attn_layout bthd --chain_dtype bfloat16 --param_dtype bfloat16
echo "== halfway100 + bthd + bf16 chain, batch 32 =="
timeout 3600 python bench.py --mode halfway100 --attn_layout bthd --chain_dtype bfloat16 --batch 32
echo "== ddim50 headline + bthd + bf16 chain =="
timeout 3600 python bench.py --attn_layout bthd --chain_dtype bfloat16
echo "== ddim50 headline + bthd + bf16 chain + bf16 params =="
timeout 3600 python bench.py --attn_layout bthd --chain_dtype bfloat16 --param_dtype bfloat16
