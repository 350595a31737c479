#!/bin/bash
cd /root/repo
OUT=/root/repo/.r4
log() { echo "$1 $(date)" >> $OUT/session5.log; }
python scripts/bench_victims.py pointconv > $OUT/bench_pointconv_ptg.log 2>&1
log "bench_pointconv_ptg rc=$?"
python scripts/profile_victims.py pointconv > $OUT/profile_pointconv_ptg.log 2>&1
log "profile_pointconv_ptg rc=$?"
log "SESSION5 DONE"
