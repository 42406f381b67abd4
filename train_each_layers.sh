#!/usr/bin/env bash
# Per-layer sweep (reference train_each_layers.sh): one decompose+finetune run
# per MSCA block of mscan-t.
for i in $(seq 1 13); do
  python scripts/main.py --config "configs/msca-rep/each_layer/msca-rep_d1_l${i}_fix_class-t.py" "$@"
done
