#!/bin/bash
# Pre-warm the persistent XLA compile cache (.jax_cache) by running every
# bench part against the current code, in the driver's priority order.
# Run after any code freeze so the driver's bench window sees warm compiles
# (README "Provenance" paragraph). Results + telemetry land in the log.
cd /root/repo
LOG=${1:-/tmp/warm_bench.log}
: > "$LOG"
run() {  # run <part> <timeout_sec> [env KEY=V ...]
  local part=$1 cap=$2; shift 2
  echo "=== $part ($(date +%H:%M:%S)) ===" >> "$LOG"
  env "$@" timeout "$cap" python bench.py --part "$part" 2>&1 \
    | grep -v '"_tel"' | tail -1 >> "$LOG"
}
ONEB=AUDIOCRAFT_CACHE_GROWTH_FRACS=1.0
run lat_w8a8 800 $ONEB
run train 600
run train30 800
run encodec 700
run audiogen 900
run melody 600
run magnet 1100
run lat_ttfa 600 $ONEB
run lat_b8 600
run lat_magnet 700
run train30_remat 500
echo "=== ALL DONE ($(date +%H:%M:%S)) ===" >> "$LOG"
