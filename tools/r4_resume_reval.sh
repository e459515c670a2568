#!/usr/bin/env bash
# Remainder of the round-4 TPU revalidation (the first run died with the int4 quant
# stage queued — bench x3 + bf16/fp8/int8/int8_dynamic rows are already in /tmp/r4_reval).
# Sequential on purpose; keep the host quiet. See tools/r4_tpu_revalidate.sh for stages.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4_reval
mkdir -p "$OUT"

echo "== probe =="
if ! timeout 120 python -c "import jax; print(jax.devices())"; then
    echo "TPU unreachable; re-run later" >&2
    exit 1
fi

echo "== quant int4 =="
python tools/profile_quant.py int4 2>"$OUT/quant_int4.err" | tee "$OUT/quant_int4.json"

echo "== XXL long-form windowed 90 s =="
python tools/probe_longform.py --windowed 90 2>"$OUT/longform_windowed.err" \
    | tee "$OUT/longform_windowed.json"

echo "== XXL single-window 60 s =="
python tools/probe_longform.py 60 2>"$OUT/longform_60.err" | tee "$OUT/longform_60.json"

echo "== XXL V2A windowed 90 s =="
python tools/probe_longform.py --v2a 90 2>"$OUT/longform_v2a.err" \
    | tee "$OUT/longform_v2a.json"

echo "== parity-gate self test =="
python tools/validate_parity.py --self_test 2>&1 | tail -5 | tee "$OUT/self_test.log"

echo "== unroll A/B =="
python tools/profile_unroll.py 2>"$OUT/unroll.err" | tee "$OUT/unroll.json"

echo "== done; results under $OUT =="
