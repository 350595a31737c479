#!/bin/bash
# TPU liveness probe loop: trivial matmul every cycle; on first success,
# run the three transposed probes + tpu_verify, logging to .r4/.
cd /root/repo
OUT=/root/repo/.r4
for i in $(seq 1 200); do
  python - <<'PY' > $OUT/liveness.log 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128,128))
print((x@x).sum())
PY
  if [ $? -eq 0 ]; then
    echo "TPU LIVE at cycle $i, $(date)" >> $OUT/probe_driver.log
    python scripts/knn_transposed_probe.py   > $OUT/knn_probe.log 2>&1
    echo "knn rc=$?" >> $OUT/probe_driver.log
    python scripts/ballq_transposed_probe.py > $OUT/ballq_probe.log 2>&1
    echo "ballq rc=$?" >> $OUT/probe_driver.log
    python scripts/fps_transposed_probe.py   > $OUT/fps_probe.log 2>&1
    echo "fps rc=$?" >> $OUT/probe_driver.log
    python scripts/tpu_verify.py             > $OUT/tpu_verify.log 2>&1
    echo "verify rc=$?" >> $OUT/probe_driver.log
    echo "ALL PROBES DONE $(date)" >> $OUT/probe_driver.log
    exit 0
  fi
  echo "cycle $i dead, $(date)" >> $OUT/probe_driver.log
  sleep 60
done
