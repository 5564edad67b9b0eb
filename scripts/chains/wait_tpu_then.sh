#!/bin/bash
# Wait until the TPU tunnel answers a tiny jitted op (the r3/r4 failure mode
# is a wedged device RPC that strands every client), then exec the given
# command. Probe is bounded so a dead tunnel can't strand the supervisor too.
#   usage: wait_tpu_then.sh <logfile> <cmd...>
set -u
LOG=$1; shift
probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jax.jit(lambda x: x.sum())(jnp.ones((128, 128)))) == 128 * 128
EOF
}
ok=0
for i in $(seq 1 120); do            # up to ~3h of patience
  if probe; then
    ok=$((ok + 1))
    echo "[wait_tpu] probe $i OK ($ok consecutive) $(date -u +%H:%M:%S)" >>"$LOG"
    [ "$ok" -ge 2 ] && { echo "[wait_tpu] tunnel healthy — launching: $*" >>"$LOG"; exec "$@"; }
  else
    ok=0
    echo "[wait_tpu] probe $i failed $(date -u +%H:%M:%S)" >>"$LOG"
    sleep 60
  fi
done
echo "[wait_tpu] GAVE UP after 120 probes" >>"$LOG"
exit 1
