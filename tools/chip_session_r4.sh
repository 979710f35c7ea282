#!/bin/bash
# Round-4 chip session: run once the relay recovers. Sequential (ONE chip).
# Logs to /tmp/chip_r4/*.log; safe to re-run (everything is cached/idempotent).
set -u
mkdir -p /tmp/chip_r4
cd /root/repo

echo "=== $(date) waiting for relay ==="
for i in $(seq 1 200); do
  timeout 45 python -c "
import jax, numpy as np, jax.numpy as jnp
jax.devices(); np.asarray(jnp.arange(4)*2); print('RELAY_HEALTHY')
" 2>/dev/null | grep -q RELAY_HEALTHY && break
  sleep 55
done
echo "=== $(date) relay healthy ==="

echo "=== exp_transpose ==="
timeout 1800 python tools/exp_transpose.py >/tmp/chip_r4/transpose.log 2>&1
tail -6 /tmp/chip_r4/transpose.log

echo "=== exp_montmul_probe ==="
timeout 1800 python tools/exp_montmul_probe.py >/tmp/chip_r4/montmul.log 2>&1
tail -8 /tmp/chip_r4/montmul.log

echo "=== exp_rows_scan small (2^16 validate) ==="
timeout 3600 python tools/exp_rows_scan.py 16 16 >/tmp/chip_r4/rows16.log 2>&1
tail -6 /tmp/chip_r4/rows16.log

echo "=== ntt m=1024 leaf trial ==="
timeout 3600 env MYZKP_NTT_LEAF_M=1024 python tools/exp_ntt_prof.py \
  >/tmp/chip_r4/ntt1024.log 2>&1
tail -8 /tmp/chip_r4/ntt1024.log

echo "=== $(date) done ==="
