#!/usr/bin/env bash
# Interactive / one-shot /v1/chat/completions client (port of the reference
# tools/chat.sh semantics: README:921-944). Usage:
#   ./tools/chat.sh [--url http://host:port] ["one-shot prompt"]
set -euo pipefail

URL="${LLAMA_BOX_URL:-http://127.0.0.1:8080}"
MODEL="${MODEL:-default}"
TEMP="${TEMP:-0.8}"
MAX_TOKENS="${MAX_TOKENS:-512}"
MESSAGES='[]'

while [[ $# -gt 0 ]]; do
  case "$1" in
    --url) URL="$2"; shift 2 ;;
    --temp) TEMP="$2"; shift 2 ;;
    --max-tokens) MAX_TOKENS="$2"; shift 2 ;;
    *) ONESHOT="$1"; shift ;;
  esac
done

ask() {
  local content="$1"
  MESSAGES=$(jq -c --arg c "$content" '. + [{"role":"user","content":$c}]' <<<"$MESSAGES")
  local body
  body=$(jq -nc --argjson msgs "$MESSAGES" --argjson t "$TEMP" --argjson m "$MAX_TOKENS" \
    '{messages:$msgs, temperature:$t, max_tokens:$m, stream:true}')
  local reply=""
  while IFS= read -r line; do
    [[ "$line" == data:* ]] || continue
    local payload="${line#data: }"
    [[ "$payload" == "[DONE]" ]] && break
    local delta
    delta=$(jq -r '.choices[0].delta.content // empty' <<<"$payload" 2>/dev/null) || continue
    printf '%s' "$delta"
    reply+="$delta"
  done < <(curl -sN "$URL/v1/chat/completions" -H 'Content-Type: application/json' -d "$body")
  echo
  MESSAGES=$(jq -c --arg c "$reply" '. + [{"role":"assistant","content":$c}]' <<<"$MESSAGES")
}

if [[ -n "${ONESHOT:-}" ]]; then
  ask "$ONESHOT"
  exit 0
fi

echo "chatting with $URL (ctrl-d to exit)"
while IFS= read -r -p "> " prompt; do
  [[ -z "$prompt" ]] && continue
  ask "$prompt"
done
