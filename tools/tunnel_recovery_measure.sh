#!/bin/bash
# Probe the TPU tunnel until it answers (the dev tunnel has multi-hour full
# outages — see memory/CLAUDE.md), then immediately run the full on-chip
# measurement sequence one process at a time: tools/pee_profile.py (per-pass
# timings + tile_px sweep), then the bench. Artifacts land in /tmp.
cd /root/repo
for i in $(seq 1 400); do
  echo "probe $i $(date +%H:%M:%S)"
  timeout 300 python -c "
import jax, jax.numpy as jnp
print('TUNNEL_OK', float(jnp.sum(jnp.ones((64,64), jnp.float32))))
" 2>/dev/null && break
  if [ "$i" = 400 ]; then echo TUNNEL_STILL_DOWN; exit 1; fi
  sleep 240
done
echo "=== tunnel up $(date +%H:%M:%S); pee_profile ==="
timeout 1800 python tools/pee_profile.py 2>/tmp/pee_profile.err | tee /tmp/pee_profile.json
echo "=== bench $(date +%H:%M:%S) ==="
# 5400: a wedged first worker eats its 1800 s timeout, the retry needs up
# to another 1800, and the CPU-backend e2e leg adds up to 900 before the
# line prints — 2400 could kill a COMPLETED on-chip measurement unprinted
timeout 5400 python bench.py 2>/tmp/bench_r3f.err | tee /tmp/bench_r3f.json
echo "=== done $(date +%H:%M:%S) ==="
