#!/bin/bash
# Round-5 product chain — the VERDICT r4 asks, in risk order:
#
#   1. Postfilter continuation 9k → 30k steps on the NDAC-coded corpus
#      (VERDICT #4: trajectory through ≥30k; the 9k model was the binding
#      under-training constraint on every quality axis).
#   2. Operating-point sweep at 30k with the CI-carrying ab_eval, auto-pick
#      (VERDICT #2: find a point that beats the coded input on SI-SDR,
#      LogSpecMSE AND ESTOI; paired per-file deltas now decide).
#   3. ReFlow distill AT the pick + finetune (aux spectral/waveform losses)
#      from the 30k checkpoint, then ONE AB_r05.json on the EXPANDED test
#      split (60 files, bootstrap CIs — VERDICT #1 #6) with rows
#      {coded, teacher@pick, teacher@N3_s10, student N1/N2, finetuned}.
#   4. BENCH_ALL_r05 incl. the picked-op-point headline re-measure
#      (VERDICT #5), then a time-boxed codec extension toward the +2 dB bar
#      (VERDICT #3) with the resume-safe best-keeper, archived into the repo.
#
# Resumable: stage markers in /root/campaign5. Reuses /root/campaign4's
# artifacts (codec ndac_r4, corpus_ndac2, postfilter ndac25b) — all still on
# disk this round. Optional DEADLINE_TS (epoch secs) bounds the codec tail.
set -u
REPO=/root/repo
W4=/root/campaign4
WORK=/root/campaign5
LOGS=$WORK/logs
CORPUS=/root/corpus
CODEC=$W4/codec_ckpts/ndac_r4
NDAC2=/root/corpus_ndac2
CKPTS=$W4/ckpts
mkdir -p "$LOGS" "$WORK"
cd "$REPO"

mark() { touch "$WORK/$1.done"; echo "[chain5] $1 done $(date -u +%H:%M:%S)"; }
have() { [ -f "$WORK/$1.done" ]; }
run_stage() { # name timeout_s retries -- cmd...
  local name=$1 tmo=$2 tries=$3; shift 3
  have "$name" && { echo "[chain5] $name already done"; return 0; }
  local i
  for i in $(seq 1 "$tries"); do
    echo "[chain5] $name attempt $i/$tries: $*" | tee -a "$LOGS/$name.log"
    if timeout "$tmo" "$@" >>"$LOGS/$name.log" 2>&1; then
      mark "$name"; return 0
    fi
    echo "[chain5] $name attempt $i FAILED (rc=$? incl. timeout)" | tee -a "$LOGS/$name.log"
    sleep 10
  done
  echo "[chain5] $name EXHAUSTED — aborting" | tee -a "$LOGS/$name.log"
  exit 1
}
run_stage_soft() { # like run_stage but a timeout/failure does NOT abort —
  # used for training stages whose periodic checkpoints make partial
  # completion useful (the gate below decides whether to proceed)
  local name=$1 tmo=$2; shift 2
  have "$name" && { echo "[chain5] $name already done"; return 0; }
  echo "[chain5] $name (soft, ${tmo}s): $*" | tee -a "$LOGS/$name.log"
  timeout "$tmo" "$@" >>"$LOGS/$name.log" 2>&1 \
    && mark "$name" \
    || echo "[chain5] $name ended rc=$? — continuing on its checkpoints" \
       | tee -a "$LOGS/$name.log"
}

BETA=$(grep '^beta' "$W4/params.txt" | awk '{print $3}')
[ -n "$BETA" ] || { echo "[chain5] EMPTY beta — abort"; exit 1; }

# ---- S0: wait for the r4 chain to release the chip -------------------------
if [ -n "${CHAIN4_PID:-}" ]; then
  waited=0
  while kill -0 "$CHAIN4_PID" 2>/dev/null; do
    sleep 60; waited=$((waited + 60))
    [ "$waited" -ge 14400 ] && { echo "[chain5] chain4 still alive after 4 h — proceeding is unsafe, abort"; exit 1; }
  done
  echo "[chain5] chain4 (pid $CHAIN4_PID) exited after ${waited}s wait"
fi

# ---- S1: code the extra 36-file test2 split through the SAME codec that
# coded corpus_ndac2 (distribution-consistent expansion to n=60) -------------
run_stage code_test2 3600 2 python scripts/code_corpus.py \
  --corpus "$CORPUS" --out "$NDAC2" --codec-ckpt "$CODEC/best" \
  --nq 10 --batch 8 --splits test2 --report
if [ ! -s "$NDAC2/test_big_pairs.txt" ]; then
  cat "$NDAC2/test_pairs.txt" "$NDAC2/test2_pairs.txt" > "$NDAC2/test_big_pairs.txt"
fi

# ---- S2: postfilter continuation 9k → 30k (auto-resumes from last/) --------
# Adaptive target: a tunnel outage can eat hours, and losing the sweep/
# distill/finetune/AB stages to a fixed 30k budget would cost more evidence
# than the marginal steps buy. Budget the downstream stages (~5.6 h), spend
# what remains on training at the measured 1.72 steps/s effective rate.
NOW=$(date +%s)
DOWNSTREAM=20700
TRAIN_S=$(( ${DEADLINE_TS:-$((NOW + 36000))} - NOW - DOWNSTREAM ))
TARGET=$(( 9000 + TRAIN_S * 172 / 100 ))
[ "$TARGET" -gt 30000 ] && TARGET=30000
[ "$TARGET" -lt 20000 ] && TARGET=20000
TRAIN_TMO=$(( (TARGET - 9000) * 100 / 150 + 1800 ))  # slack vs 1.5 steps/s floor
echo "[chain5] postfilter target=$TARGET steps (train budget ${TRAIN_S}s, tmo ${TRAIN_TMO}s)"
run_stage_soft postfilter30k "$TRAIN_TMO" python train.py \
  --config-name campaign_synth_25m --run-id ndac25b \
  "corpus_dir=$NDAC2" "model.feature_extractor.beta=$BETA" \
  "trainer_options.max_steps=$TARGET" "dirs.checkpoint_dir=$CKPTS/" \
  "dirs.logger_save_dir=$W4/runs/" trainer_options.hang_timeout=1800
get_step() {
  # CPU-only: a helper jax client attaching to a wedged axon tunnel hangs
  # forever and would strand the chain between stages
  env JAX_PLATFORMS=cpu timeout 300 python - "$1" <<'EOF'
import sys
from flowdec_tpu.train.checkpoints import CheckpointManager
m = CheckpointManager(sys.argv[1]); print(m.latest_step() or 0); m.close()
EOF
}
STEP=$(get_step "$CKPTS/ndac25b")
if [ "$STEP" -lt 20000 ]; then
  # one more resume attempt (compile-hang / tunnel-wedge failure mode; the
  # run auto-resumes from last/, so a retry only repeats the lost tail)
  rm -f "$WORK/postfilter30k.done"
  run_stage_soft postfilter30k "$TRAIN_TMO" python train.py \
    --config-name campaign_synth_25m --run-id ndac25b \
    "corpus_dir=$NDAC2" "model.feature_extractor.beta=$BETA" \
    "trainer_options.max_steps=$TARGET" "dirs.checkpoint_dir=$CKPTS/" \
    "dirs.logger_save_dir=$W4/runs/" trainer_options.hang_timeout=1800
  STEP=$(get_step "$CKPTS/ndac25b")
fi
echo "[chain5] postfilter at step $STEP"
[ "$STEP" -ge 19000 ] || { echo "[chain5] continuation below 19k — abort"; exit 1; }

# ---- S3: operating-point sweep at the continued checkpoint (24-file split,
# no new solver graphs ⇒ warm compiles; sigma_fac is traced) -----------------
run_stage sweep30k 7200 2 python scripts/ab_eval.py \
  --pairs "$NDAC2/test_pairs.txt" --delim , \
  --variant "N3_s10:$CKPTS/ndac25b:3:midpoint:1.0" \
  --variant "N3_s085:$CKPTS/ndac25b:3:midpoint:0.85" \
  --variant "N3_s07:$CKPTS/ndac25b:3:midpoint:0.7" \
  --variant "N4_s10:$CKPTS/ndac25b:4:midpoint:1.0" \
  --variant "N6_s10:$CKPTS/ndac25b:6:midpoint:1.0" \
  --variant "N6_s085:$CKPTS/ndac25b:6:midpoint:0.85" \
  --variant "N6_s07:$CKPTS/ndac25b:6:midpoint:0.7" \
  --out "$REPO/AB_r05_sweep.json"

# ---- S4: pick the operating point via the PAIRED deltas --------------------
python - "$REPO/AB_r05_sweep.json" "$WORK/op_point.txt" <<'EOF' || exit 1
import json, sys
res = json.load(open(sys.argv[1]))
cands = {k: v for k, v in res.items()
         if k not in ("coded_input", "n_files", "n_boot")}
def d(v, k):
    return v["delta_vs_coded"][k]["mean"]
def tier(v):  # 2: dominates all three axes; 1: perceptual+spectral; 0: rest
    if d(v, "sisdr") > 0 and d(v, "logspec_mse") < 0 and d(v, "estoi") > 0:
        return 2
    if d(v, "logspec_mse") < 0 and d(v, "estoi") > 0:
        return 1
    return 0
def score(v):
    # tier-0 fallback: balanced composite instead of raw max-ESTOI (which at
    # 9k picked a point with 2x-worse spectra). Scales: 0.1 ESTOI ~ 20
    # LogSpecMSE ~ 2 dB SI-SDR of practical significance.
    return d(v, "estoi") - d(v, "logspec_mse") / 200.0 + d(v, "sisdr") / 20.0
best_tier = max(tier(v) for v in cands.values())
pool = {k: v for k, v in cands.items() if tier(v) == best_tier}
pick = max(pool, key=lambda k: (d(pool[k], "sisdr") if best_tier
                                else score(pool[k])))
n = int(pick.split("_")[0][1:])
sf = int(pick.split("_s")[1]) / (10.0 if len(pick.split("_s")[1]) < 3 else 100.0)
flag = {2: "FLAGSHIP_MET", 1: "FLAGSHIP_PARTIAL", 0: "FLAGSHIP_MISS"}[best_tier]
with open(sys.argv[2], "w") as f:
    f.write(f"variant {pick}\nn {n}\nsolver midpoint\nsigma_fac {sf}\nstatus {flag}\n")
print(f"[pick] {pick} ({flag}) deltas: sisdr {d(pool[pick],'sisdr'):+.2f} "
      f"logspec {d(pool[pick],'logspec_mse'):+.1f} estoi {d(pool[pick],'estoi'):+.3f}")
EOF
N=$(awk '$1=="n"{print $2}' "$WORK/op_point.txt")
SOLVER=$(awk '$1=="solver"{print $2}' "$WORK/op_point.txt")
SF=$(awk '$1=="sigma_fac"{print $2}' "$WORK/op_point.txt")
echo "[chain5] operating point: N=$N $SOLVER sigma_fac=$SF ($(awk '$1=="status"{print $2}' "$WORK/op_point.txt"))"

# ---- S5: ReFlow distill AT the pick from the 30k teacher -------------------
run_stage_soft distill30k 7200 python scripts/distill.py \
  --ckpt "$CKPTS/ndac25b" --out-ckpt "$CKPTS/ndac25c_reflow" \
  --pairs-file "$NDAC2/train_pairs.txt" \
  --teacher-N "$N" --teacher-solver "$SOLVER" --sigma-fac "$SF" \
  --steps 2500 --batch-size 2 --ema-decay 0.998 --hang-timeout 1800 \
  --ckpt-every 500
[ -d "$CKPTS/ndac25c_reflow/last" ] || { echo "[chain5] no student ckpt — abort"; exit 1; }

# ---- S6: finetune from the 30k checkpoint with the wired aux losses --------
run_stage_soft finetune30k 7200 python train.py \
  --config-name finetune_campaign_25m --run-id ft25b \
  --resume-from-checkpoint "$CKPTS/ndac25b" --finetune \
  "corpus_dir=$NDAC2" "model.feature_extractor.beta=$BETA" \
  trainer_options.max_steps=2000 "dirs.checkpoint_dir=$CKPTS/" \
  "dirs.logger_save_dir=$W4/runs/" trainer_options.hang_timeout=1800
[ -d "$CKPTS/ft25b/last" ] || { echo "[chain5] no finetuned ckpt — abort"; exit 1; }

# ---- S7: THE A/B of record — expanded split, CIs, paired deltas ------------
run_stage ab_r05 10800 2 python scripts/ab_eval.py \
  --pairs "$NDAC2/test_big_pairs.txt" --delim , --per-file \
  --variant "teacher_pick:$CKPTS/ndac25b:$N:$SOLVER:$SF" \
  --variant "teacher_N3_s10:$CKPTS/ndac25b:3:midpoint:1.0" \
  --variant "student_N1:$CKPTS/ndac25c_reflow:1:euler:$SF" \
  --variant "student_N2:$CKPTS/ndac25c_reflow:2:euler:$SF" \
  --variant "finetuned_pick:$CKPTS/ft25b:$N:$SOLVER:$SF" \
  --variant "finetuned_N3_s10:$CKPTS/ft25b:3:midpoint:1.0" \
  --out "$REPO/AB_r05.json"

# ---- S8: BENCH_ALL r5 incl. the picked-op-point headline line --------------
# The r4 bench_copy2 lesson: BENCH_ALL cold-compiles several graphs (the
# scratch wipe also wiped the persistent compile cache) and 3600 s timed out
# mid-compile TWICE. Bigger budget, line-buffered tee so a timeout still
# salvages every line measured so far, and the first attempt's compiles warm
# the cache for the second.
run_stage_soft bench_r05 7200 bash -c \
  "BENCH_ALL=1 BENCH_OP_POINT='$N:$SOLVER' stdbuf -oL python bench.py \
   | tee '$REPO/BENCH_ALL_r05.json.tmp'"
if ! have bench_r05; then
  rm -f "$WORK/bench_r05.done"
  run_stage_soft bench_r05 5400 bash -c \
    "BENCH_ALL=1 BENCH_OP_POINT='$N:$SOLVER' stdbuf -oL python bench.py \
     | tee '$REPO/BENCH_ALL_r05.json.tmp'"
fi
grep '^{' "$REPO/BENCH_ALL_r05.json.tmp" > "$REPO/BENCH_ALL_r05.json" || true
rm -f "$REPO/BENCH_ALL_r05.json.tmp"

# ---- S9: time-boxed codec extension toward the +2 dB autoencode bar --------
NOW=$(date +%s)
CODEC_TMO=$(( ${DEADLINE_TS:-$((NOW + 7200))} - NOW - 1500 ))
if [ "$CODEC_TMO" -ge 900 ]; then
  run_stage_soft codec_ext "$CODEC_TMO" python scripts/train_codec.py \
    --pairs-file "$CORPUS/train_pairs.txt" --ckpt-dir "$CODEC" \
    --steps 30000 --batch-size 16 --crop-seconds 0.38 \
    --lr 1e-4 --lr2 3e-5 --lr-switch 6000 --ckpt-every 500 \
    --w-mel 5 --w-stft 1 --w-waveform 10 --w-snr 15 --w-complex-stft 5 \
    --nq-min 4 --valid-pairs "$CORPUS/valid_pairs.txt" --eval-every 500
else
  echo "[chain5] no time left for codec_ext (tmo=$CODEC_TMO)"
fi

# ---- S10: archive the codec evidence into the repo -------------------------
mkdir -p "$REPO/artifacts"
cp "$CODEC/codec_eval.jsonl" "$REPO/artifacts/codec_eval_ndac_r4.jsonl" || true
cp "$W4/runs/ndac25b/metrics.jsonl" "$REPO/artifacts/postfilter_ndac25b_metrics.jsonl" || true
echo "[chain5] COMPLETE $(date -u)"
