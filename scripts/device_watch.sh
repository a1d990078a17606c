#!/bin/bash
# device_watch.sh — poll the tunneled TPU; when it answers, lift the
# protocol pause (/tmp/spcct_pause) so run_protocol_r3.sh resumes.
# Used after the axon tunnel died mid-round-3 (BASELINE.md round-3 note).
cd /root/repo
while true; do
  if timeout 60 python - <<'EOF' >/dev/null 2>&1
from spcct_tpu.utils.jax_cache import enable
enable()
import jax, jax.numpy as jnp
assert jax.devices()
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
  then
    echo "[device_watch] TPU alive at $(date -u +%H:%M:%S); resuming protocol"
    rm -f /tmp/spcct_pause
    exit 0
  fi
  echo "[device_watch] dead at $(date -u +%H:%M:%S)"
  sleep 240
done
