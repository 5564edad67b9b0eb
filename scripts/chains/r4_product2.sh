#!/bin/bash
# Round-4 product chain, part 2 — operating-point-aware second half.
#
# Context (CAMPAIGN.md r4 §8-9): at 9k steps the teacher already IMPROVES
# ESTOI on the NDAC-coded test split (0.266 vs coded 0.197) and is within
# +10.7 of the coded LogSpecMSE at N3-midpoint, while N1/N2 beat SI-SDR
# (+1.1 vs +0.36) with noise-dominated spectra — the injected-bridge-noise
# signature. Part 1 (r4_product.sh) was stopped after its S5/S6 so the
# distill stage would NOT run at the default sigma_fac=1 operating point.
#
# This chain: sigma_fac×N sweep → pick the best operating point from the
# JSON (beats coded on ESTOI+LogSpecMSE, then max SI-SDR; fallback: max
# ESTOI) → ReFlow-distill AT that point → full A/B → finetune + A/B.
# Resumable via the same marker scheme as part 1.
set -u
REPO=/root/repo
WORK=/root/campaign4
LOGS=$WORK/logs
NDAC2=/root/corpus_ndac2
CKPTS=$WORK/ckpts
mkdir -p "$LOGS" "$CKPTS"
cd "$REPO"

mark() { touch "$WORK/$1.done"; echo "[chain2] $1 done $(date -u +%H:%M:%S)"; }
have() { [ -f "$WORK/$1.done" ]; }
run_stage() {
  local name=$1 tmo=$2 tries=$3; shift 3
  have "$name" && { echo "[chain2] $name already done"; return 0; }
  local i
  for i in $(seq 1 "$tries"); do
    echo "[chain2] $name attempt $i/$tries: $*" | tee -a "$LOGS/$name.log"
    if timeout "$tmo" "$@" >>"$LOGS/$name.log" 2>&1; then
      mark "$name"; return 0
    fi
    echo "[chain2] $name attempt $i FAILED (rc=$?)" | tee -a "$LOGS/$name.log"
    sleep 10
  done
  echo "[chain2] $name EXHAUSTED — aborting" | tee -a "$LOGS/$name.log"
  exit 1
}

BETA=$(grep '^beta' "$WORK/params.txt" | awk '{print $3}')
[ -n "$BETA" ] || { echo "[chain2] EMPTY beta — abort"; exit 1; }

# ---- S6b: BENCH_ALL scoreboard copy (cache-warm rerun if part 1's orphan
# didn't land the repo copy) --------------------------------------------------
if [ ! -s "$REPO/BENCH_ALL_r04.json" ]; then
  run_stage bench_copy2 3600 2 bash -c \
    "BENCH_ALL=1 python bench.py > '$REPO/BENCH_ALL_r04.json.tmp' && mv '$REPO/BENCH_ALL_r04.json.tmp' '$REPO/BENCH_ALL_r04.json'"
fi

# ---- S7a: operating-point sweep (sigma_fac ladder at N3-mp, N6-mp, N1-s0) --
run_stage sigma_sweep 7200 2 python scripts/ab_eval.py \
  --pairs "$NDAC2/test_pairs.txt" --delim , \
  --variant "N3_s10:$CKPTS/ndac25b:3:midpoint:1.0" \
  --variant "N3_s07:$CKPTS/ndac25b:3:midpoint:0.7" \
  --variant "N3_s04:$CKPTS/ndac25b:3:midpoint:0.4" \
  --variant "N3_s00:$CKPTS/ndac25b:3:midpoint:0.0" \
  --variant "N6_s07:$CKPTS/ndac25b:6:midpoint:0.7" \
  --variant "N1_s00:$CKPTS/ndac25b:1:euler:0.0" \
  --out "$REPO/AB_r04_sigma_sweep.json"

# ---- S7b: pick the operating point from the sweep ---------------------------
python - "$REPO/AB_r04_sigma_sweep.json" "$WORK/op_point.txt" <<'EOF' || exit 1
import json, sys
res = json.load(open(sys.argv[1]))
base = res["coded_input"]
cands = {k: v for k, v in res.items() if k not in ("coded_input", "n_files")}
def beats(v):  # the flagship bar: improve the coded input perceptually+spectrally
    return v["estoi"] > base["estoi"] and v["logspec_mse"] < base["logspec_mse"]
winners = {k: v for k, v in cands.items() if beats(v)}
pool = winners or cands
pick = max(pool, key=lambda k: pool[k]["sisdr"] if winners else pool[k]["estoi"])
n, solver, sf = {"N3": (3, "midpoint"), "N6": (6, "midpoint"), "N1": (1, "euler")}[
    pick.split("_")[0]] + (int(pick.split("_s")[1]) / 10.0,)
flag = "FLAGSHIP_MET" if winners else "FLAGSHIP_MISS"
with open(sys.argv[2], "w") as f:
    f.write(f"variant {pick}\nn {n}\nsolver {solver}\nsigma_fac {sf}\nstatus {flag}\n")
print(f"[pick] {pick} ({flag}): {pool[pick]}")
EOF
N=$(awk '$1=="n"{print $2}' "$WORK/op_point.txt")
SOLVER=$(awk '$1=="solver"{print $2}' "$WORK/op_point.txt")
SF=$(awk '$1=="sigma_fac"{print $2}' "$WORK/op_point.txt")
echo "[chain2] operating point: N=$N $SOLVER sigma_fac=$SF ($(awk '$1=="status"{print $2}' "$WORK/op_point.txt"))"

# ---- S7c: ReFlow distillation AT the chosen operating point -----------------
run_stage distill2 7200 2 python scripts/distill.py \
  --ckpt "$CKPTS/ndac25b" --out-ckpt "$CKPTS/ndac25b_reflow" \
  --pairs-file "$NDAC2/train_pairs.txt" \
  --teacher-N "$N" --teacher-solver "$SOLVER" --sigma-fac "$SF" \
  --steps 2500 --batch-size 2 --ema-decay 0.998 --hang-timeout 1800

# ---- S8: full A/B — teacher at the chosen point vs distilled student at the
# matching sigma (students integrate in 1-2 euler steps by construction) ------
run_stage ab_full2 5400 2 python scripts/ab_eval.py \
  --pairs "$NDAC2/test_pairs.txt" --delim , \
  --variant "teacher_pick:$CKPTS/ndac25b:$N:$SOLVER:$SF" \
  --variant "student_N1:$CKPTS/ndac25b_reflow:1:euler:$SF" \
  --variant "student_N2:$CKPTS/ndac25b_reflow:2:euler:$SF" \
  --out "$REPO/AB_r04.json"

# ---- S9: executed finetune stage (VERDICT r3 #5) + its A/B ------------------
run_stage finetune 7200 2 python train.py --config-name finetune_campaign_25m \
  --run-id ft25 --resume-from-checkpoint "$CKPTS/ndac25b" --finetune \
  "corpus_dir=$NDAC2" "model.feature_extractor.beta=$BETA" \
  "dirs.checkpoint_dir=$CKPTS/" "dirs.logger_save_dir=$WORK/runs/" \
  trainer_options.hang_timeout=1800

run_stage ab_finetune 5400 2 python scripts/ab_eval.py \
  --pairs "$NDAC2/test_pairs.txt" --delim , \
  --variant "teacher_pick:$CKPTS/ndac25b:$N:$SOLVER:$SF" \
  --variant "finetuned_pick:$CKPTS/ft25:$N:$SOLVER:$SF" \
  --out "$REPO/AB_r04_finetune.json"

echo "[chain2] COMPLETE $(date -u)"
