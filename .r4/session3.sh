#!/bin/bash
cd /root/repo
OUT=/root/repo/.r4
log() { echo "$1 $(date)" >> $OUT/session3.log; }
python scripts/bench_victims.py > $OUT/bench_victims2.log 2>&1
log "bench_victims2 rc=$?"
python scripts/profile_victims.py dgcnn > $OUT/profile_dgcnn2.log 2>&1
log "profile_dgcnn2 rc=$?"
python scripts/profile_victims.py pointnet++ > $OUT/profile_pn2.log 2>&1
log "profile_pn2 rc=$?"
log "SESSION3 DONE"
