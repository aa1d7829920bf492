#!/usr/bin/env bash
# Function-calling demo (reference tools/chat_tool_square_root_of_number.sh): exposes square_root_of_number and
# answers the tool call locally.
set -euo pipefail
URL="${LLAMA_BOX_URL:-http://127.0.0.1:8080}"
Q="${1:-What is the square root of 144?}"
TOOLS='[{"type":"function","function":{"name":"square_root_of_number","description":"Compute the square root of a number","parameters":{"type":"object","properties":{"number":{"type":"number"}},"required":["number"]}}}]'
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
RESULT='{"result": 12}'
curl -s "$URL/v1/chat/completions" -H 'Content-Type: application/json' -d "$(jq -nc \
  --arg q "$Q" --argjson call "$CALL" --arg id "$ID" --arg r "$RESULT" --argjson tools "$TOOLS" \
  '{messages:[{"role":"user","content":$q},
              {"role":"assistant","content":null,"tool_calls":[$call]},
              {"role":"tool","tool_call_id":$id,"content":$r}],
    tools:$tools, max_tokens:256, temperature:0.0}')" \
  | jq -r '.choices[0].message.content'
