#!/bin/bash
# Full-Criteo dress rehearsal, one command (round-4 verdict #4).
#
# Synthesizes a >=50M-row criteo-format file with a planted signal
# (known Bayes-AUC ceiling), stream-trains DeepFM on the real chip,
# compares streaming vs device-resident throughput, runs the
# reference's canonical AUC protocol on a subsample with BOTH
# frameworks, and appends the record to BASELINE.md.
#
# When a REAL day_* dump appears:
#   CRITEO_PATH=/path/to/day_0 ROWS=0 bash tools/on_full_criteo.sh
# (ROWS=0 skips synthesis; the real file's stages run unchanged —
#  protocol: /root/reference/examples/run_classification_criteo.py:63-66)

set -u
cd "$(dirname "$0")/.."
PATH_FILE="${CRITEO_PATH:-/tmp/criteo_synth.txt}"
ROWS="${ROWS:-50000000}"
OUT="/tmp/full_criteo_rehearsal.json"

STAGES="stream,resident,auc"
if [ "$ROWS" != "0" ]; then STAGES="synth,$STAGES"; fi

echo "== full-criteo rehearsal: $PATH_FILE rows=$ROWS stages=$STAGES"
python tools/full_criteo_rehearsal.py \
    --path "$PATH_FILE" --rows "$ROWS" --stages "$STAGES" \
    ${STREAM_CHUNKS:+--stream-chunks "$STREAM_CHUNKS"} \
    ${AUC_ROWS:+--auc-rows "$AUC_ROWS"} | tee "$OUT"
status=$?
echo "rehearsal exit: $status"

if [ $status -eq 0 ]; then
    {
        echo ""
        echo "### Full-Criteo dress rehearsal ($(date -u +%F)) — tools/on_full_criteo.sh"
        echo ""
        echo '```'
        tail -1 "$OUT"
        echo '```'
    } >> BASELINE.md
    echo "appended to BASELINE.md"
fi
