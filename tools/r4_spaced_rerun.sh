#!/usr/bin/env bash
# Round-4 follow-up hardware stages, with inter-stage spacing: the axon server GCs a
# finished process's allocations lazily, and an XXL stage started 0 s after the previous
# one exited RESOURCE_EXHAUSTED while the same program ran clean 25 min later (CLAUDE.md
# gotcha). Sleep ~5 min before/between XXL processes.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4_reval
mkdir -p "$OUT"

echo "== spacing sleep =="
sleep 300

echo "== XXL T2A long-form windowed 90 s (re-run) =="
python tools/probe_longform.py --windowed 90 2>"$OUT/longform_windowed.err" \
    | tee "$OUT/longform_windowed.json"

sleep 300
echo "== streaming TTFA 90 s =="
python tools/probe_stream.py 90 2>"$OUT/stream_ttfa.err" | tee "$OUT/stream_ttfa.json"

echo "== done =="
