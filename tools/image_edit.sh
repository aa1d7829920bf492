#!/usr/bin/env bash
# /v1/images/edits client (multipart; port of reference tools/image_edit.sh).
set -euo pipefail
URL="${LLAMA_BOX_URL:-http://127.0.0.1:8080}"
IMAGE="${1:?usage: image_edit.sh IMAGE PROMPT [MASK]}"
PROMPT="${2:?usage: image_edit.sh IMAGE PROMPT [MASK]}"
MASK="${3:-}"
OUT="${OUT:-edited.png}"
args=(-F "image=@$IMAGE" -F "prompt=$PROMPT" -F "size=${SIZE:-512x512}")
[[ -n "$MASK" ]] && args+=(-F "mask=@$MASK")
curl -s "$URL/v1/images/edits" "${args[@]}" \
  | jq -r '.data[0].b64_json' | base64 -d > "$OUT"
echo "wrote $OUT"
