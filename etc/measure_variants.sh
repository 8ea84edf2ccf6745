#!/bin/bash
# Encode-kernel variant sweep on the real chip (run when the axon
# tunnel is healthy). Each variant is a separate process so env-keyed
# kernel defaults re-evaluate; the persistent jax compile cache makes
# reruns cheap. ~5-20 min per variant first time (tunnel compiles).
set -u
MB=${1:-64}
cd "$(dirname "$0")/.."
for v in \
    "TDC_PACK_PAIR=0" \
    "TDC_PACK_PAIR=1" \
    "TDC_PACK_PAIR=1 TDC_PACK_GROUP=16" \
    "TDC_PACK_QUAD=1" \
    "TDC_PACK_QUAD=1 TDC_PACK_GROUP=16" \
    "TDC_PACK_PAIR=0 TDC_PACK_WINDOW=128" \
    "TDC_PACK_QUAD=1 TDC_MIN_CODE_LEN=4" \
    "TDC_PACK_PAIR=0 TDC_MIN_CODE_LEN=4" \
    ; do
    echo "=== $v (corpus ${MB}MiB) ==="
    env $v timeout 3000 python -u etc/probe_encode.py "$MB" 2>&1 | grep -v xla_bridge
done
