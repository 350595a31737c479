#!/bin/bash
cd /root/repo
OUT=/root/repo/.r4
log() { echo "$1 $(date)" >> $OUT/session2.log; }
python scripts/knn_transposed_probe.py > $OUT/knn_probe2.log 2>&1
log "knn2 rc=$?"
python scripts/bench_victims.py > $OUT/bench_victims.log 2>&1
log "bench_victims rc=$?"
python scripts/profile_victims.py dgcnn pointconv pct pointnet2 > $OUT/profile_hard.log 2>&1
log "profile_hard rc=$?"
PROF_B=64 python scripts/profile_victims.py pointnet > $OUT/profile_pointnet.log 2>&1
log "profile_pointnet rc=$?"
python bench.py > $OUT/bench.log 2>&1
log "bench rc=$?"
python scripts/tpu_verify.py > $OUT/tpu_verify2.log 2>&1
log "verify2 rc=$?"
log "SESSION2 DONE"
