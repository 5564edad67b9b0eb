#!/bin/bash
# Round-4 operating-point sweep: sigma_fac × N on the 9k ndac25b teacher.
#
# Why (CAMPAIGN.md r4 §8): the S4 validation trajectory shows the teacher
# trading spectral fidelity for alignment — N3-midpoint SI-SDR climbs
# (−6.3 → −0.56) while its LogSpecMSE drifts UP (201 → 214, coded baseline
# 168.9), and N1-euler already beats the coded input on SI-SDR (+1.5 vs
# −0.35) with catastrophic spectra (3313). Both signatures point at the
# INJECTED bridge noise (sigma_fac·sigma_y, global 0.503 on this corpus)
# surviving integration, not at backbone blur — so before buying a 1 h
# training extension, measure the cheap knob: start the bridge closer to
# the coded input (sigma_fac < 1) and/or integrate finer (N6).
#
# Runs AFTER the product chain's S5 marker exists; owns the chip (kill the
# product chain first if it has moved on to S6+, see r4_extend.sh header).
set -u
REPO=/root/repo
WORK=/root/campaign4
LOGS=$WORK/logs
NDAC2=/root/corpus_ndac2
CKPTS=$WORK/ckpts
mkdir -p "$LOGS"
cd "$REPO"

mark() { touch "$WORK/$1.done"; echo "[sweep] $1 done $(date -u +%H:%M:%S)"; }
have() { [ -f "$WORK/$1.done" ]; }
run_stage() {
  local name=$1 tmo=$2 tries=$3; shift 3
  have "$name" && { echo "[sweep] $name already done"; return 0; }
  local i
  for i in $(seq 1 "$tries"); do
    echo "[sweep] $name attempt $i/$tries: $*" | tee -a "$LOGS/$name.log"
    if timeout "$tmo" "$@" >>"$LOGS/$name.log" 2>&1; then
      mark "$name"; return 0
    fi
    echo "[sweep] $name attempt $i FAILED (rc=$?)" | tee -a "$LOGS/$name.log"
    sleep 10
  done
  echo "[sweep] $name EXHAUSTED" | tee -a "$LOGS/$name.log"
  exit 1
}

# N3-midpoint sigma ladder + a fine-integration point (N6 midpoint, NFE 12)
# + the deterministic-init extreme (sigma_fac 0). Identical per-file noise
# keys across variants (ab_eval folds the seed per file index).
run_stage sigma_sweep 7200 2 python scripts/ab_eval.py \
  --pairs "$NDAC2/test_pairs.txt" --delim , \
  --variant "N3_s10:$CKPTS/ndac25b:3:midpoint:1.0" \
  --variant "N3_s07:$CKPTS/ndac25b:3:midpoint:0.7" \
  --variant "N3_s04:$CKPTS/ndac25b:3:midpoint:0.4" \
  --variant "N3_s00:$CKPTS/ndac25b:3:midpoint:0.0" \
  --variant "N6_s07:$CKPTS/ndac25b:6:midpoint:0.7" \
  --variant "N1_s00:$CKPTS/ndac25b:1:euler:0.0" \
  --out "$REPO/AB_r04_sigma_sweep.json"

echo "[sweep] COMPLETE $(date -u)"
