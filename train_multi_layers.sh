#!/usr/bin/env bash
# Cumulative multi-layer sweep (reference train_multi_layers.sh).
for i in $(seq 2 12); do
  python scripts/main.py --config "configs/msca-rep/multi_layers/msca-rep_d1_ml${i}_fix_mscan-t.py" "$@"
done
