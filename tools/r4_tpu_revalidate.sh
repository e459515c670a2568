#!/usr/bin/env bash
# Round-4 TPU revalidation queue — the round's hardware deliverables, sequential on
# purpose (two TPU processes contend and both slow ~2x; see CLAUDE.md). Stages run
# UNBOUNDED: killing a TPU process mid-execution leaks its device allocations server-side,
# so let each stage finish or fail on its own; interrupt only between stages.
# Keep the host QUIET while this runs (1 CPU core — a concurrent pytest inflates the
# dispatch-side walls of every timing stage). Logs land in /tmp/r4_reval/.
#
#   bash tools/r4_tpu_revalidate.sh
#
# Stages:
#   1. probe        — 60s jax.devices() gate (abort early if the service is down)
#   2. bench x3     — confirm the >=3.2 audio-sec/sec band (BENCH headline, bf16)
#   3. quant sweep  — per-mode step time + NON-VACUOUS fidelity (perturbed zero-init
#                     leaves; latent corr/rel-L2 + decoded spectral corr): bf16 first
#                     (writes the reference latents/audio), then fp8/int8/int8_dynamic/
#                     int4 (nibble-packed — the round-3 RecursionError fix, repro_int4.py)
#   4. long-form    — XXL windowed 90 s (3x30 s windows, inpainting stitch) + single 60 s
#                     on the real chip (VERDICT r3 item 3)
#   5. self-test    — parity-gate tooling stays turnkey (validate_parity --self_test)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4_reval
mkdir -p "$OUT"

echo "== stage 1: probe =="
if ! timeout 120 python -c "import jax; print(jax.devices())"; then
    echo "TPU unreachable; re-run later" >&2
    exit 1
fi

echo "== stage 2: bench x3 =="
for i in 1 2 3; do
    python bench.py 2>"$OUT/bench_$i.err" | tee "$OUT/bench_$i.json"
done

echo "== stage 3: quant sweep (one subprocess per mode; fidelity now non-vacuous) =="
for mode in bf16 fp8_e4m3fn int8 int8_dynamic int4; do
    python tools/profile_quant.py "$mode" 2>"$OUT/quant_$mode.err" \
        | tee "$OUT/quant_$mode.json"
done

echo "== stage 4: XXL long-form on hardware =="
python tools/probe_longform.py --windowed 90 2>"$OUT/longform_windowed.err" \
    | tee "$OUT/longform_windowed.json"
python tools/probe_longform.py 60 2>"$OUT/longform_60.err" | tee "$OUT/longform_60.json"

echo "== stage 5: parity-gate self test =="
python tools/validate_parity.py --self_test 2>&1 | tail -5 | tee "$OUT/self_test.log"

echo "== done; results under $OUT =="
