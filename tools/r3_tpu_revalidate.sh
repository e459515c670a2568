#!/usr/bin/env bash
# Round-3 TPU revalidation queue — run ONCE when the axon service returns from an outage.
#
# Sequential on purpose (two TPU processes contend and both slow ~2x; see CLAUDE.md).
# Stages run UNBOUNDED: killing a TPU process mid-execution leaks its device allocations
# server-side (CLAUDE.md), so let each stage finish or fail on its own; interrupt only
# between stages. Logs land in /tmp/r3_reval/.
#
#   bash tools/r3_tpu_revalidate.sh
#
# Stages:
#   1. probe       — 60s jax.devices() gate (abort early if the service is still down)
#   2. bench x3    — confirm the 3.18 audio-sec/sec band post-hoists (BENCH headline)
#   3. quant sweep — per-mode post-hoist step times (ROADMAP table refresh): bf16 first
#                    (writes the latent-correlation reference), then fp8/int8/int8_dynamic
#   4. self-test   — parity-gate tooling stays turnkey (validate_parity --self_test)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r3_reval
mkdir -p "$OUT"

echo "== stage 1: probe =="
if ! timeout 60 python -c "import jax; print(jax.devices())"; then
    echo "TPU still unreachable; re-run later" >&2
    exit 1
fi

echo "== stage 2: bench x3 =="
for i in 1 2 3; do
    python bench.py 2>"$OUT/bench_$i.err" | tee "$OUT/bench_$i.json"
done

echo "== stage 3: quant sweep (one subprocess per mode) =="
for mode in bf16 fp8_e4m3fn int8 int8_dynamic int4; do
    python tools/profile_quant.py "$mode" 2>"$OUT/quant_$mode.err" \
        | tee "$OUT/quant_$mode.json"
done

echo "== stage 4: parity-gate self test =="
python tools/validate_parity.py --self_test 2>&1 | tail -5 | tee "$OUT/self_test.log"

echo "== done; results under $OUT =="
