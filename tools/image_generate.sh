#!/usr/bin/env bash
# Streaming /v1/images/generations client.
# Behavioral port of the reference tools/image_generate.sh (original
# implementation): SSE progress display, per-step preview PNGs, chunked
# b64 result accumulation, usage report (TTP/TPG/GPS/TC).
#
# Usage:  [ENV...] ./image_generate.sh "a prompt"      one-shot
#         [ENV...] ./image_generate.sh                 interactive loop
#         ./image_generate.sh @request.json            raw JSON body
set -u

API_URL="${API_URL:-${LLAMA_BOX_URL:-http://127.0.0.1:8080}}"
LOG_FILE="${LOG_FILE:-/dev/null}"

N="${N:-1}"
SIZE="${SIZE:-512x512}"
QUALITY="${QUALITY:-standard}"
STYLE="${STYLE:-null}"
PREVIEW="${PREVIEW:-true}"
CHUNK="${CHUNK:-true}"
SAMPLE_METHOD="${SAMPLE_METHOD:-${SAMPLER:-null}}"
SAMPLING_STEPS="${SAMPLING_STEPS:-${SAMPLE_STEPS:-10}}"
SCHEDULE_METHOD="${SCHEDULE_METHOD:-${SCHEDULER:-${SCHEDULE:-default}}}"
SEED="${SEED:-$(date +%s)}"
GUIDANCE="${GUIDANCE:-3.5}"
CFG_SCALE="${CFG_SCALE:-4.5}"
NEGATIVE_PROMPT="${NEGATIVE_PROMPT:-}"
OUT_DIR="${OUT_DIR:-/tmp}"

cat <<EOF
=====================================================
API_URL           : ${API_URL}
LOG_FILE          : ${LOG_FILE}
N                 : ${N}
SIZE              : ${SIZE}
QUALITY           : ${QUALITY} // one of [standard, hd]
STYLE             : ${STYLE} // one of [natural, vivid]
PREVIEW           : ${PREVIEW}
SAMPLE_METHOD     : ${SAMPLE_METHOD} // overrides QUALITY/STYLE if set, e.g. [euler_a, euler, heun, dpm2, dpm++2s_a, dpm++2mv2, ipndm, ipndm_v, lcm, ddim_trailing, tcd]
SAMPLING_STEPS    : ${SAMPLING_STEPS}
SCHEDULE_METHOD   : ${SCHEDULE_METHOD} // one of [default, discrete, karras, exponential, ays, gits]
SEED              : ${SEED}
GUIDANCE          : ${GUIDANCE}
CFG_SCALE         : ${CFG_SCALE}
NEGATIVE_PROMPT   : ${NEGATIVE_PROMPT}
=====================================================

EOF
: >"${LOG_FILE}" 2>/dev/null || true

ROOT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd -P)"

# build_body PROMPT -> JSON request on stdout (python3; no jq dependency)
build_body() {
    PROMPT_IN="$1" N="$N" SIZE="$SIZE" QUALITY="$QUALITY" STYLE="$STYLE" \
    PREVIEW="$PREVIEW" CHUNK="$CHUNK" SAMPLE_METHOD="$SAMPLE_METHOD" \
    SAMPLING_STEPS="$SAMPLING_STEPS" SCHEDULE_METHOD="$SCHEDULE_METHOD" \
    SEED="$SEED" GUIDANCE="$GUIDANCE" CFG_SCALE="$CFG_SCALE" \
    NEGATIVE_PROMPT="$NEGATIVE_PROMPT" python3 - <<'EOF'
import json, os
e = os.environ
p = e["PROMPT_IN"]
base = (json.load(open(p[1:])) if p.startswith("@") and os.path.isfile(p[1:])
        else {"prompt": p})
body = {"n": int(e["N"]), "response_format": "b64_json",
        "size": e["SIZE"], "stream": True,
        "stream_options": {"preview": e["PREVIEW"] == "true",
                           "chunk_result": e["CHUNK"] == "true",
                           "chunk_size": 262144}}
if e["SAMPLE_METHOD"] != "null":
    body.update(sample_method=e["SAMPLE_METHOD"],
                sampling_steps=int(e["SAMPLING_STEPS"]),
                schedule_method=e["SCHEDULE_METHOD"], seed=int(e["SEED"]),
                guidance=float(e["GUIDANCE"]),
                cfg_scale=float(e["CFG_SCALE"]),
                negative_prompt=e["NEGATIVE_PROMPT"])
elif e["STYLE"] != "null":
    body.update(quality=e["QUALITY"], style=e["STYLE"])
else:
    body.update(quality=e["QUALITY"])
body.update(base)
print(json.dumps(body))
EOF
}

generate() {
    local prompt="$1" body run_id
    body="$(build_body "${prompt}")" || return 1
    printf '%s\n' "Q: ${body}" >>"${LOG_FILE}"
    run_id="$(date +%s)"
    curl -s --no-buffer -X POST \
        "${API_URL}/v1/images/generations" \
        -H 'Content-Type: application/json' \
        -d "${body}" | tee -a "${LOG_FILE}" |
        python3 "${ROOT_DIR}/_image_sse.py" \
            "image_generate_${run_id}" "${OUT_DIR}" "$(date +%s)"
    printf '\n'
}

if [[ $# -ge 1 ]]; then
    echo "> $*"
    generate "$*"
else
    while IFS= read -r -e -p "> " PROMPT; do
        [[ "${PROMPT}" == "exit" || "${PROMPT}" == "quit" ]] && break
        [[ -z "${PROMPT}" ]] && continue
        generate "${PROMPT}"
    done
fi
