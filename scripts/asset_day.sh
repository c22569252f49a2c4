#!/usr/bin/env bash
# Asset-day: one command from downloaded reference checkpoints to a
# PASS/FAIL parity verdict (docs/asset_day_runbook.md, steps 2-6).
#
#   scripts/asset_day.sh --eva-vit eva_vit_g.pth \
#       --blip2 blip2_pretrained_flant5xl.pth \
#       --t5 <hf flan-t5-xl dir (incl. tokenizer)> \
#       --lora <mr-BLIP finetuned ckpt> \
#       [--out /tmp/asset_day] [--int8] [--tolerance 1.0]
#
# Chain: port (zero skipped tensors enforced) -> real-vocab tokenizer
# assertions -> Charades-STA eval (bf16) -> metric-vs-BASELINE gate
# [-> int8 rerun + drift gate]. Exits non-zero on the first failed gate;
# the last line is "ASSET-DAY: PASS" or "ASSET-DAY: FAIL <reason>".
set -uo pipefail

cd "$(dirname "$0")/.."

EVA= BLIP2= T5= LORA= OUT=/tmp/asset_day INT8=0 TOL=1.0
while [ $# -gt 0 ]; do
  case "$1" in
    --eva-vit) EVA=$2; shift 2 ;;
    --blip2) BLIP2=$2; shift 2 ;;
    --t5) T5=$2; shift 2 ;;
    --lora) LORA=$2; shift 2 ;;
    --out) OUT=$2; shift 2 ;;
    --int8) INT8=1; shift ;;
    --tolerance) TOL=$2; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done
[ -n "$EVA" ] && [ -n "$BLIP2" ] && [ -n "$T5" ] && [ -n "$LORA" ] || {
  echo "ASSET-DAY: FAIL missing one of --eva-vit --blip2 --t5 --lora (see header)"; exit 2; }
mkdir -p "$OUT"
PARAMS="$OUT/params.msgpack"

fail() { echo "ASSET-DAY: FAIL $*"; exit 1; }

# HF must not try the network for anything (zero-egress safe).
export HF_HUB_OFFLINE=1 TRANSFORMERS_OFFLINE=1

echo "== [1/5] port checkpoints -> $PARAMS (expect ~25 min, ~61 GB RSS at XL geometry)"
python scripts/port_weights.py --arch blip2_mr --model-type pretrain_flant5xl \
    --eva-vit "$EVA" --blip2 "$BLIP2" --t5 "$T5" --lora "$LORA" \
    --tokenizer-path "$T5" --output "$PARAMS" 2>&1 | tee "$OUT/port.log"
[ "${PIPESTATUS[0]}" -eq 0 ] || fail "port_weights.py exited non-zero"
if grep -q "tensors skipped" "$OUT/port.log"; then
  fail "port skipped tensors (any skip is a bug — see $OUT/port.log)"
fi
[ -s "$PARAMS" ] || fail "no params written"

echo "== [2/5] real-vocab tokenizer assertions (tests/test_real_vocab.py)"
MRBLIP_TOKENIZER_PATH="$T5" JAX_PLATFORMS=cpu \
    python -m pytest tests/test_real_vocab.py -x -q 2>&1 | tee "$OUT/vocab.log"
[ "${PIPESTATUS[0]}" -eq 0 ] || fail "real-vocab assertions failed"

run_eval() {  # $1 = config, $2 = outdir tag
  rm -rf "$OUT/$2"
  python evaluate.py --cfg-path "$1" --options \
      model.finetuned="$PARAMS" model.load_finetuned=True \
      model.params_dtype=bfloat16 model.tokenizer_path="$T5" \
      run.output_dir="$OUT/$2" 2>&1 | tee "$OUT/$2.log"
  [ "${PIPESTATUS[0]}" -eq 0 ] || fail "evaluate.py ($2) exited non-zero"
  ls "$OUT/$2"/*/log.txt >/dev/null 2>&1 || fail "no metrics written ($2)"
}

echo "== [3/5] Charades-STA eval, bf16 parity path (20 frames, beam 5)"
run_eval configs/projects/eval/charades.yaml eval_charades

echo "== [4/5] metric gate vs BASELINE.md (tolerance $TOL points)"
python scripts/asset_gates.py baseline "$OUT/eval_charades" "$TOL" \
  || fail "metric gate (see above)"

if [ "$INT8" -eq 1 ]; then
  echo "== [5/5] int8 quality gate (runbook step 6: each metric within 0.5 of bf16)"
  run_eval configs/projects/eval/charades_int8.yaml eval_charades_int8
  python scripts/asset_gates.py int8 "$OUT/eval_charades" \
    "$OUT/eval_charades_int8" || fail "int8 drift gate"
else
  echo "== [5/5] int8 gate skipped (pass --int8 to run; REQUIRED before calling int8 the production serving path)"
fi

echo "ASSET-DAY: PASS"
