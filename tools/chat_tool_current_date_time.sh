#!/usr/bin/env bash
# Function-calling demo (reference tools/chat_tool_current_date_time.sh): exposes current_date_time and
# answers the tool call locally.
set -euo pipefail
URL="${LLAMA_BOX_URL:-http://127.0.0.1:8080}"
Q="${1:-What time is it right now?}"
TOOLS='[{"type":"function","function":{"name":"current_date_time","description":"Get the current date and time","parameters":{"type":"object","properties":{},"required":[]}}}]'
RESP=$(curl -s "$URL/v1/chat/completions" -H 'Content-Type: application/json' -d "$(jq -nc \
  --arg q "$Q" --argjson tools "$TOOLS" \
  '{messages:[{"role":"user","content":$q}], tools:$tools, max_tokens:256, temperature:0.0}')")
CALL=$(jq -r '.choices[0].message.tool_calls[0] // empty' <<<"$RESP")
if [[ -z "$CALL" ]]; then
  jq -r '.choices[0].message.content' <<<"$RESP"
  exit 0
fi
NAME=$(jq -r '.function.name' <<<"$CALL")
ARGS=$(jq -r '.function.arguments' <<<"$CALL")
ID=$(jq -r '.id' <<<"$CALL")
echo "tool call: $NAME($ARGS)"
RESULT='{"datetime": "2026-08-17T12:00:00Z"}'
curl -s "$URL/v1/chat/completions" -H 'Content-Type: application/json' -d "$(jq -nc \
  --arg q "$Q" --argjson call "$CALL" --arg id "$ID" --arg r "$RESULT" --argjson tools "$TOOLS" \
  '{messages:[{"role":"user","content":$q},
              {"role":"assistant","content":null,"tool_calls":[$call]},
              {"role":"tool","tool_call_id":$id,"content":$r}],
    tools:$tools, max_tokens:256, temperature:0.0}')" \
  | jq -r '.choices[0].message.content'
