#!/bin/bash
# Kernel-geometry sweep at the single-radial-chunk config (r3): the old
# optima (g_tile=256, 8x16 tiles, gate_bins=8) were measured at t_chunk=64
# with per-chunk work lists; the single-chunk gate ladder changed the
# per-item cost balance, so re-measure each axis. Sequential (one TPU).
# Usage: bash tools/geomsweep.sh [iters]   # results -> /tmp/geomsweep.log
set -u
ITERS=${1:-240}
LOG=/tmp/geomsweep.log
echo "=== geometry sweep $(date) ===" >> "$LOG"
run() {
  name=$1; shift
  echo "--- $name: $* ---" >> "$LOG"
  timeout 2400 python bench.py --iters "$ITERS" "$@" >> "$LOG" 2>&1
  echo "exit=$?" >> "$LOG"
}
run gate16 --gate-bins 16
run gate4 --gate-bins 4
run gtile512 --g-tile 512
run tiles16x16 --t-theta 16 --t-phi 16
run tiles8x32 --t-theta 8 --t-phi 32
echo "=== sweep done $(date) ===" >> "$LOG"
