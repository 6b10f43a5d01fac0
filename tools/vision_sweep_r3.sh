#!/bin/bash
# VERDICT r2 item 4: vision zipf+dedup chunk sweep (206.9 device @ chunk 96
# -> target >=219). Chunk must divide the dedup cap (288); all candidates
# stay in the unrolled-chunk regime (k <= 8).
for chunk in 144 288 72 48; do
  echo "=== chunk=$chunk $(date +%H:%M:%S) ==="
  BENCH_CONFIG=vision_morec_zipf BENCH_ENCODER_CHUNK=$chunk \
    timeout 1800 python bench.py 2>&1 | tail -1
done
echo "=== headline re-run (post embed-reformulation) $(date +%H:%M:%S) ==="
timeout 1500 python bench.py 2>&1 | tail -1
echo "=== done $(date +%H:%M:%S) ==="
