#!/usr/bin/env bash
# Concurrency benchmark harness (behavioral port of the reference
# tools/batch_chat.sh, original implementation): ramps parallel request
# counts 1,1,2,4,8,4,2,1 (first level is warmup) or runs a fixed level,
# and prints a per-level report parsed from response usage/timings:
#   cc (ok) | cost | tokens (prefill, decoded) | throughput
#           | avg prefill tps | avg decode tps
#
# Usage:  ./batch_chat.sh                 ramp with preset prompts
#         ./batch_chat.sh 8               one level, 8 concurrent
#         ./batch_chat.sh 4 "prompt"      fixed prompt
#         ./batch_chat.sh 4 @body.json    raw chat JSON body
#         ./batch_chat.sh 4 RANDOM_512    512-char synthetic prompt
#
# JSON is handled with python3 (no jq dependency).
set -u

API_URL="${API_URL:-${LLAMA_BOX_URL:-http://127.0.0.1:8080}}"
TEMP="${TEMP:-1}"
TOP_P="${TOP_P:-0.95}"
MAX_TOKENS="${MAX_TOKENS:-1024}"
SEED="${SEED:-$(date +%s)}"
STREAM="${STREAM:-false}"
WORK="$(mktemp -d)"
trap 'rm -rf "${WORK}"' EXIT

PROMPTS=(
    "Introduce the city you like best in at least 500 words."
    "Hello, please introduce yourself in at least 100 words."
    "Write a simple number guessing game in Python."
    "How do you make fresh apple juice? Describe every step."
    "Tell me a story about a cat and a dog in at least 300 words."
    "I want to visit Hong Kong from New York. Suggest attractions and travel routes."
    "What pitfalls should I watch out for when using thread pools in Java?"
    "Analyze the attention mechanisms used in Transformer architectures in detail."
)

now_ms() { python3 -c 'import time; print(int(time.time()*1000))'; }

# build_body CONTENT -> chat request JSON on stdout (CONTENT is a plain
# prompt or a raw JSON body to merge over the defaults)
build_body() {
    CONTENT="$1" TEMP="$TEMP" TOP_P="$TOP_P" MAX_TOKENS="$MAX_TOKENS" \
    SEED="$SEED" STREAM="$STREAM" python3 - <<'EOF'
import json, os
c = os.environ["CONTENT"]
body = {
    "temperature": float(os.environ["TEMP"]),
    "top_p": float(os.environ["TOP_P"]),
    "max_tokens": int(os.environ["MAX_TOKENS"]),
    "seed": int(os.environ["SEED"]),
    "stream": os.environ["STREAM"] == "true",
}
if c.startswith("{"):
    body.update(json.loads(c))
else:
    body["messages"] = [{"role": "user", "content": c}]
if body["stream"]:
    body["stream_options"] = {"include_usage": True}
print(json.dumps(body))
EOF
}

# jget FILE path1 path2 ... -> first existing dotted path's value
jget() {
    local f="$1"; shift
    python3 - "$f" "$@" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
except Exception:
    print(0); sys.exit(0)
for p in sys.argv[2:]:
    v = d; ok = True
    for k in p.split("."):
        if isinstance(v, dict) and k in v:
            v = v[k]
        else:
            ok = False; break
    if ok and v is not None:
        print(v); sys.exit(0)
print("")
EOF
}

random_prompt() {
    python3 -c '
import random, sys
n = int(sys.argv[1])
pools = ["0123456789",
         "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
         "".join(chr(0x4E00 + i) for i in range(0, 0x5000, 97))]
print("".join(random.choice(random.choice(pools)) for _ in range(n)))' "$1"
}

# one request; writes the final response JSON to $2
one_request() {
    local content="$1" out="$2" rid="$3" body
    body="$(build_body "${content}")"
    if [[ "${STREAM}" != "true" ]]; then
        curl -ks -X POST "${API_URL}/v1/chat/completions" \
            -H 'Content-Type: application/json' \
            -H "X-Request-ID: ${rid}" -d "${body}" >"${out}"
        return
    fi
    # stream: keep the last data chunk (carries usage via include_usage)
    curl -ks --no-buffer -X POST "${API_URL}/v1/chat/completions" \
        -H 'Content-Type: application/json' \
        -H "X-Request-ID: ${rid}" -d "${body}" |
        while IFS= read -r line; do
            case "${line}" in
            "data: [DONE]"*) break ;;
            "data: "*) printf '%s' "${line:6}" >"${out}" ;;
            "error: "*) printf '%s' "${line:7}" >"${out}" ;;
            esac
        done
}

# run one concurrency level and print a report row
level() {
    local sq="$1" cc="$2" content="${3:-}"
    local i t0 t1 cost
    if [[ -n "${content}" ]]; then
        if [[ "${content:0:1}" == "@" && -f "${content:1}" ]]; then
            content="$(cat "${content:1}")"
        elif [[ "${content}" == RANDOM_* ]]; then
            content="$(random_prompt "${content#RANDOM_}")"
        fi
    fi
    t0=$(now_ms)
    for ((i = 0; i < cc; i++)); do
        local c="${content}"
        [[ -z "${c}" ]] && c="${PROMPTS[$((i % ${#PROMPTS[@]}))]}"
        one_request "${c}" "${WORK}/resp_${sq}_${i}.json" "${sq}-${i}" &
    done
    wait
    t1=$(now_ms)
    cost=$((t1 - t0))

    local ok="${cc}" pts=0 dts=0 ppss=0 dpss=0
    for ((i = 0; i < cc; i++)); do
        local f="${WORK}/resp_${sq}_${i}.json" pt ct pps dps
        pt="$(jget "${f}" usage.prompt_tokens timings.prompt_n)"
        ct="$(jget "${f}" usage.completion_tokens timings.predicted_n)"
        pps="$(jget "${f}" usage.prompt_tokens_per_second \
               timings.prompt_per_second)"
        dps="$(jget "${f}" usage.tokens_per_second \
               timings.predicted_per_second)"
        if [[ -z "${pt}" || "${pt}" == "0" ]]; then
            ok=$((ok - 1))
            continue
        fi
        pts=$(awk "BEGIN{print ${pts} + ${pt}}")
        dts=$(awk "BEGIN{print ${dts} + ${ct:-0}}")
        [[ -n "${pps}" ]] && ppss=$(awk "BEGIN{print ${ppss} + ${pps}}")
        [[ -n "${dps}" ]] && dpss=$(awk "BEGIN{print ${dpss} + ${dps}}")
    done
    local tts
    tts=$(awk "BEGIN{print ${pts} + ${dts}}")
    local tps avg_pps avg_dps
    tps=$(awk "BEGIN{printf \"%.2f\", ${tts} * 1000 / ${cost}}")
    if [[ "${ok}" -gt 0 ]]; then
        avg_pps=$(awk "BEGIN{printf \"%.2f\", ${ppss} / ${ok}}")
        avg_dps=$(awk "BEGIN{printf \"%.2f\", ${dpss} / ${ok}}")
    else
        avg_pps=0 avg_dps=0
    fi
    printf ' %2d (%2d) |%8d ms |%7d (%7d, %7d) |%9.2f tps |%9.2f tps |%9.2f tps \n' \
        "${cc}" "${ok}" "${cost}" "${tts}" "${pts}" "${dts}" \
        "${tps}" "${avg_pps}" "${avg_dps}"
}

echo "STREAM=${STREAM} API_URL=${API_URL} TEMP=${TEMP} TOP_P=${TOP_P} MAX_TOKENS=${MAX_TOKENS} SEED=${SEED}"
echo " cc (ok) |    cost    | tokens (prefill, decoded) |  throughput  | avg. prefill | avg. decoded  "
echo "---------|------------|---------------------------|--------------|--------------|-------------- "
if [[ -n "${1:-}" ]]; then
    level 1 "$1" "${2:-}"
else
    LEVELS=(1 1 2 4 8 4 2 1)
    for j in "${!LEVELS[@]}"; do
        if [[ "${j}" == 0 ]]; then
            level "w" "${LEVELS[$j]}" "${2:-}" >/dev/null 2>&1  # warmup
            continue
        fi
        level "${j}" "${LEVELS[$j]}" "${2:-}"
    done
fi
