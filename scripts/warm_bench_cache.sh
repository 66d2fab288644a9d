#!/bin/bash
# Warm the persistent XLA compile cache (.jax_cache) for every bench part.
#
# Run this AFTER the last code change that touches traced model code and
# BEFORE the driver's bench window: any commit that changes transformer/LM
# tracing invalidates the cache keys for the big decode/train programs, and
# a bench part killed mid-compile leaves nothing in the cache (entries are
# written only when a compile completes). One full standalone pass per part
# makes the driver-window run all-warm: measured 2026-08-19, e.g. melody
# 396 s cold -> well under its cap warm, magnet 438 s cold (359 s compile)
# -> seconds of compile warm.
#
# Parts run sequentially (one TPU client at a time), each under a generous
# timeout; per-part env must match bench.py PARTS (_ONE_BUCKET parts pin
# the KV growth schedule, which changes the compiled scan).
set -u
cd "$(dirname "$0")/.."
declare -A ENVV
ENVV[lat_b1]="AUDIOCRAFT_CACHE_GROWTH_FRACS=1.0"
ENVV[lat_w8a8]="AUDIOCRAFT_CACHE_GROWTH_FRACS=1.0"
ENVV[lat_ttfa]="AUDIOCRAFT_CACHE_GROWTH_FRACS=1.0"
PARTS="${1:-headline lat_b1 lat_w8a8 train train30 encodec audiogen melody magnet lat_ttfa lat_b8 lat_magnet train30_remat}"
for p in $PARTS; do
  echo "=== PART $p start $(date +%T) ==="
  env ${ENVV[$p]:-} timeout "${WARM_PART_TIMEOUT:-1500}" \
    python bench.py --part "$p" 2>&1 | tail -3
  echo "=== PART $p exit=$? $(date +%T) ==="
done
echo ALL_DONE
