#!/usr/bin/env bash
# Concurrency benchmark harness (port of the reference tools/batch_chat.sh:
# ramps parallel requests 1,1,2,4,8,4,2,1 — first run is warmup — and
# reports cost | tokens (prefill,decoded) | throughput | avg prefill tps |
# avg decode tps parsed from response usage).
set -euo pipefail

URL="${LLAMA_BOX_URL:-http://127.0.0.1:8080}"
MAX_TOKENS="${MAX_TOKENS:-128}"
LEVELS="${LEVELS:-1 1 2 4 8 4 2 1}"

PROMPTS=(
  "Explain the theory of relativity in simple terms."
  "Write a short poem about the sea."
  "What are the main causes of climate change?"
  "Summarize the plot of Romeo and Juliet."
  "How does a computer's CPU work?"
  "Describe the process of photosynthesis."
  "What is the difference between TCP and UDP?"
  "Give three tips for learning a new language."
)

single() {
  local idx=$1
  local prompt="${PROMPTS[$((idx % ${#PROMPTS[@]}))]}"
  curl -s "$URL/v1/chat/completions" -H 'Content-Type: application/json' -d "$(jq -nc \
    --arg p "$prompt" --argjson m "$MAX_TOKENS" \
    '{messages:[{"role":"user","content":$p}], max_tokens:$m, temperature:0.0}')" \
    | jq -r '[.usage.prompt_tokens, .usage.completion_tokens,
              .usage.prompt_tokens_per_second, .usage.tokens_per_second] | @tsv'
}

printf '%-4s | %-9s | %-22s | %-12s | %-16s | %-15s\n' \
  "cc" "cost(s)" "tokens(prefill,decode)" "throughput" "avg prefill tps" "avg decode tps"
first=1
for cc in $LEVELS; do
  t0=$(date +%s.%N)
  pids=(); outs=()
  for i in $(seq 1 "$cc"); do
    out=$(mktemp); outs+=("$out")
    single "$i" >"$out" &
    pids+=($!)
  done
  for p in "${pids[@]}"; do wait "$p"; done
  t1=$(date +%s.%N)
  cost=$(echo "$t1 - $t0" | bc)
  pre=0; dec=0; ptps=0; dtps=0
  for out in "${outs[@]}"; do
    read -r a b c d < "$out" || true
    pre=$(echo "$pre + ${a:-0}" | bc); dec=$(echo "$dec + ${b:-0}" | bc)
    ptps=$(echo "$ptps + ${c:-0}" | bc); dtps=$(echo "$dtps + ${d:-0}" | bc)
    rm -f "$out"
  done
  thr=$(echo "scale=2; $dec / $cost" | bc)
  aptps=$(echo "scale=2; $ptps / $cc" | bc)
  adtps=$(echo "scale=2; $dtps / $cc" | bc)
  label=$cc; [[ $first == 1 ]] && label="$cc*" && first=0
  printf '%-4s | %-9.2f | %-22s | %-12s | %-16s | %-15s\n' \
    "$label" "$cost" "($pre,$dec)" "$thr tps" "$aptps" "$adtps"
done
echo "(* warmup run)"
