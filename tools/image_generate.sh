#!/usr/bin/env bash
# /v1/images/generations client (port of reference tools/image_generate.sh).
set -euo pipefail
URL="${LLAMA_BOX_URL:-http://127.0.0.1:8080}"
PROMPT="${1:-a photo of a cat}"
SIZE="${SIZE:-512x512}"
STEPS="${STEPS:-20}"
OUT="${OUT:-image.png}"
curl -s "$URL/v1/images/generations" -H 'Content-Type: application/json' \
  -d "$(jq -nc --arg p "$PROMPT" --arg s "$SIZE" --argjson st "$STEPS" \
        '{prompt:$p, size:$s, sample_steps:$st}')" \
  | jq -r '.data[0].b64_json' | base64 -d > "$OUT"
echo "wrote $OUT"
