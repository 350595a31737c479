#!/bin/bash
cd /root/repo
OUT=/root/repo/.r4
log() { echo "$1 $(date)" >> $OUT/session6.log; }
python scripts/bench_victims.py pointnet++ pct pointconv > $OUT/bench_nm.log 2>&1
log "bench_nm rc=$?"
python scripts/profile_victims.py pointnet++ pct > $OUT/profile_nm.log 2>&1
log "profile_nm rc=$?"
log "SESSION6 DONE"
