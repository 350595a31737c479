#!/bin/bash
cd /root/repo
OUT=/root/repo/.r4
log() { echo "$1 $(date)" >> $OUT/session4.log; }
PROBE_VICTIM=pct python -u .r4/hlo_copy_probe.py > $OUT/hlo_pct.log 2>&1
log "hlo_pct rc=$?"
PROBE_VICTIM=pointnet++ python -u .r4/hlo_copy_probe.py > $OUT/hlo_pn2.log 2>&1
log "hlo_pn2 rc=$?"
log "SESSION4 DONE"
