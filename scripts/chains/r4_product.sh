#!/bin/bash
# Round-4 product chain — rebuilds every off-repo artifact the VM restart
# destroyed (codec checkpoint, NDAC-coded corpus, postfilter campaign) and
# lands the quality evidence of record (AB_r04_teacher / AB_r04 /
# AB_r04_finetune) plus a warm compile cache for the driver bench.
#
# Lives IN the repo (unlike r3's /root/campaign4/chain_*.sh, which a VM
# restart deleted along with its results). Stage markers make it resumable:
#   bash scripts/chains/r4_product.sh            # runs all missing stages
# Each TPU stage gets a hard timeout and one retry (the remote-tunnel
# compile-hang failure mode killed two of five r3 attempts; the persistent
# XLA cache makes retries cheap once a compile completes).
set -u
REPO=/root/repo
WORK=/root/campaign4
LOGS=$WORK/logs
CORPUS=/root/corpus
CODEC=$WORK/codec_ckpts/ndac_r4
NDAC2=/root/corpus_ndac2
CKPTS=$WORK/ckpts
mkdir -p "$LOGS" "$CKPTS"
cd "$REPO"

mark() { touch "$WORK/$1.done"; echo "[chain] $1 done $(date -u +%H:%M:%S)"; }
have() { [ -f "$WORK/$1.done" ]; }

run_stage() { # name timeout_s retries -- cmd...
  local name=$1 tmo=$2 tries=$3; shift 3
  have "$name" && { echo "[chain] $name already done"; return 0; }
  local i
  for i in $(seq 1 "$tries"); do
    echo "[chain] $name attempt $i/$tries: $*" | tee -a "$LOGS/$name.log"
    if timeout "$tmo" "$@" >>"$LOGS/$name.log" 2>&1; then
      mark "$name"; return 0
    fi
    echo "[chain] $name attempt $i FAILED (rc=$? incl. timeout)" | tee -a "$LOGS/$name.log"
    sleep 10
  done
  echo "[chain] $name EXHAUSTED — aborting chain" | tee -a "$LOGS/$name.log"
  exit 1
}

# ---- S0: corpus (CPU; make_corpus may already be running from the session) --
if ! have corpus; then
  for _ in $(seq 1 120); do [ -f "$CORPUS/test_pairs.txt" ] && break; sleep 10; done
  if [ ! -f "$CORPUS/test_pairs.txt" ]; then
    run_stage corpus_gen 3600 1 env JAX_PLATFORMS=cpu python scripts/make_corpus.py \
      --out "$CORPUS" --train 2000 --valid 48 --test 24
  fi
  mark corpus
fi

# ---- S1: codec training (the v3→v4 recipe in one run: alignment losses from
# step 0, lr 1e-4 → cold 3e-5 at 6k, nq_min 4, best-checkpoint keeper) -------
run_stage codec 10800 2 python scripts/train_codec.py \
  --pairs-file "$CORPUS/train_pairs.txt" --ckpt-dir "$CODEC" \
  --steps 12000 --batch-size 16 --crop-seconds 0.38 \
  --lr 1e-4 --lr2 3e-5 --lr-switch 6000 --ckpt-every 500 \
  --w-mel 5 --w-stft 1 --w-waveform 10 --w-snr 15 --w-complex-stft 5 \
  --nq-min 4 --valid-pairs "$CORPUS/valid_pairs.txt" --eval-every 500

# gate: the best raw autoencode must clear SI-SDR > 0.5 dB (the r4 quality
# bar was +2.12; below ~0 the corpus would be r3's phase-garbage again)
python - <<'EOF' || exit 1
import json
best = max(json.loads(l)["si_sdr_raw"] for l in open("/root/campaign4/codec_ckpts/ndac_r4/codec_eval.jsonl"))
print(f"[gate] best raw SI-SDR {best:.2f} dB")
assert best > 0.5, "codec below quality bar"
EOF

# ---- S2: re-code the corpus through the best codec checkpoint --------------
run_stage code_corpus 5400 2 python scripts/code_corpus.py \
  --corpus "$CORPUS" --out "$NDAC2" --codec-ckpt "$CODEC/best" \
  --nq 10 --batch 8 --report

# ---- S3: beta / sigma_y from the coded pairs (CPU — the TPU tunnel makes
# per-pair STFTs latency-bound; r4 measured >40 min vs <1 min on CPU) --------
if ! have params; then
  JAX_PLATFORMS=cpu python scripts/estimate_params.py \
    --pairs-file "$NDAC2/train_pairs.txt" --delim , --alpha 0.3 \
    --nfft 1534 --hop 384 --n 400 \
    --per-band "$NDAC2/sigma_y_corpus.npy" > "$WORK/params.txt" 2>"$LOGS/params.log" || exit 1
  mark params
fi
BETA=$(grep '^beta' "$WORK/params.txt" | awk '{print $3}')
[ -n "$BETA" ] && [ -f "$NDAC2/sigma_y_corpus.npy" ] || { echo "[chain] EMPTY beta/sigma — abort"; exit 1; }
echo "[chain] beta=$BETA"

# ---- S4: postfilter campaign on the v4-coded corpus ------------------------
run_stage postfilter 14400 2 python train.py --config-name campaign_synth_25m \
  --run-id ndac25b "corpus_dir=$NDAC2" "model.feature_extractor.beta=$BETA" \
  trainer_options.max_steps=9000 "dirs.checkpoint_dir=$CKPTS/" \
  "dirs.logger_save_dir=$WORK/runs/" trainer_options.hang_timeout=1800

# ---- S5: teacher-only A/B — the flagship "postfilter improves NDAC-coded
# audio" evidence (VERDICT r3 missing #1), FIRST for risk -------------------
run_stage ab_teacher 5400 2 python scripts/ab_eval.py \
  --pairs "$NDAC2/test_pairs.txt" --delim , \
  --variant "teacher_N3:$CKPTS/ndac25b:3:midpoint" \
  --variant "teacher_N1:$CKPTS/ndac25b:1:euler" \
  --variant "teacher_N2:$CKPTS/ndac25b:2:euler" \
  --out "$REPO/AB_r04_teacher.json"

# ---- S6: BENCH_ALL (also warms the persistent cache for the driver bench) --
run_stage bench_all 3600 2 env BENCH_ALL=1 python bench.py
if ! have bench_copy; then
  BENCH_ALL=1 python bench.py > "$REPO/BENCH_ALL_r04.json" 2>"$LOGS/bench_copy.log" \
    && mark bench_copy || true
fi

# ---- S7: ReFlow distillation (teacher = ndac25b) ----------------------------
run_stage distill 7200 2 python scripts/distill.py \
  --ckpt "$CKPTS/ndac25b" --out-ckpt "$CKPTS/ndac25b_reflow" \
  --pairs-file "$NDAC2/train_pairs.txt" \
  --steps 2500 --batch-size 2 --ema-decay 0.998 --hang-timeout 1800

# ---- S8: full A/B incl. the distilled student -------------------------------
run_stage ab_full 5400 2 python scripts/ab_eval.py \
  --pairs "$NDAC2/test_pairs.txt" --delim , \
  --variant "teacher_N3:$CKPTS/ndac25b:3:midpoint" \
  --variant "student_N1:$CKPTS/ndac25b_reflow:1:euler" \
  --variant "student_N2:$CKPTS/ndac25b_reflow:2:euler" \
  --out "$REPO/AB_r04.json"

# ---- S9: executed finetune stage (VERDICT r3 #5) + its A/B ------------------
run_stage finetune 7200 2 python train.py --config-name finetune_campaign_25m \
  --run-id ft25 --resume-from-checkpoint "$CKPTS/ndac25b" --finetune \
  "corpus_dir=$NDAC2" "model.feature_extractor.beta=$BETA" \
  "dirs.checkpoint_dir=$CKPTS/" "dirs.logger_save_dir=$WORK/runs/" \
  trainer_options.hang_timeout=1800

run_stage ab_finetune 5400 2 python scripts/ab_eval.py \
  --pairs "$NDAC2/test_pairs.txt" --delim , \
  --variant "teacher_N3:$CKPTS/ndac25b:3:midpoint" \
  --variant "finetuned_N3:$CKPTS/ft25:3:midpoint" \
  --out "$REPO/AB_r04_finetune.json"

echo "[chain] COMPLETE $(date -u)"
