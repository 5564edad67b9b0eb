#!/bin/bash
# Round-4 contingency: extend the ndac25b postfilter past 9000 steps and
# re-run the teacher A/B. Launch ONLY if AB_r04_teacher.json misses the
# flagship bar (teacher N3 must IMPROVE the coded input's LogSpecMSE,
# test baseline 172.4 — CAMPAIGN.md r4 §7). Kill r4_product.sh first
# (kill $(cat /tmp/chain.pid)); this script then owns the chip.
#
# train.py auto-resumes run ndac25b from its newest checkpoint, so the
# extension is exactly "same command, higher max_steps" (the preemption
# design from CAMPAIGN.md r2 doing product work).
set -u
REPO=/root/repo
WORK=/root/campaign4
LOGS=$WORK/logs
NDAC2=/root/corpus_ndac2
CKPTS=$WORK/ckpts
EXTEND_TO=${1:-15000}
cd "$REPO"

mark() { touch "$WORK/$1.done"; echo "[extend] $1 done $(date -u +%H:%M:%S)"; }
have() { [ -f "$WORK/$1.done" ]; }
run_stage() {
  local name=$1 tmo=$2 tries=$3; shift 3
  have "$name" && { echo "[extend] $name already done"; return 0; }
  local i
  for i in $(seq 1 "$tries"); do
    echo "[extend] $name attempt $i/$tries: $*" | tee -a "$LOGS/$name.log"
    if timeout "$tmo" "$@" >>"$LOGS/$name.log" 2>&1; then
      mark "$name"; return 0
    fi
    echo "[extend] $name attempt $i FAILED (rc=$?)" | tee -a "$LOGS/$name.log"
    sleep 10
  done
  echo "[extend] $name EXHAUSTED — aborting" | tee -a "$LOGS/$name.log"
  exit 1
}

BETA=$(grep '^beta' "$WORK/params.txt" | awk '{print $3}')
[ -n "$BETA" ] || { echo "[extend] EMPTY beta — abort"; exit 1; }

run_stage "postfilter_ext$EXTEND_TO" 10800 2 python train.py \
  --config-name campaign_synth_25m --run-id ndac25b "corpus_dir=$NDAC2" \
  "model.feature_extractor.beta=$BETA" \
  "trainer_options.max_steps=$EXTEND_TO" "dirs.checkpoint_dir=$CKPTS/" \
  "dirs.logger_save_dir=$WORK/runs/" trainer_options.hang_timeout=1800

run_stage "ab_teacher_ext$EXTEND_TO" 5400 2 python scripts/ab_eval.py \
  --pairs "$NDAC2/test_pairs.txt" --delim , \
  --variant "teacher_N3:$CKPTS/ndac25b:3:midpoint" \
  --variant "teacher_N3_s07:$CKPTS/ndac25b:3:midpoint:0.7" \
  --variant "teacher_N1:$CKPTS/ndac25b:1:euler" \
  --variant "teacher_N2:$CKPTS/ndac25b:2:euler" \
  --out "$REPO/AB_r04_teacher.json"

# hand control back to the main chain for the remaining stages (distill,
# full A/B, finetune) — its markers for S0-S6 are already present, so it
# resumes exactly at S7.
exec bash scripts/chains/r4_product.sh
