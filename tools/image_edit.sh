#!/usr/bin/env bash
# Streaming /v1/images/edits client (multipart).
# Behavioral port of the reference tools/image_edit.sh (original
# implementation): uploads IMAGE (+MASK/+CONTROL) as multipart form
# parts, streams SSE progress/previews, accumulates chunked b64 results,
# prints the usage report.
#
# Usage:  IMAGE=photo.png [MASK=m.png] ./image_edit.sh "make it night"
set -u

API_URL="${API_URL:-${LLAMA_BOX_URL:-http://127.0.0.1:8080}}"
LOG_FILE="${LOG_FILE:-/dev/null}"

N="${N:-1}"
SIZE="${SIZE:-512x512}"
QUALITY="${QUALITY:-standard}"
IMAGE="${IMAGE:-}"
MASK="${MASK:-}"
CONTROL="${CONTROL:-}"
PREVIEW="${PREVIEW:-true}"
CHUNK="${CHUNK:-true}"
SAMPLE_METHOD="${SAMPLE_METHOD:-${SAMPLER:-null}}"
SAMPLING_STEPS="${SAMPLING_STEPS:-${SAMPLE_STEPS:-10}}"
SCHEDULE_METHOD="${SCHEDULE_METHOD:-${SCHEDULER:-${SCHEDULE:-default}}}"
SEED="${SEED:-$(date +%s)}"
GUIDANCE="${GUIDANCE:-3.5}"
STRENGTH="${STRENGTH:-0.75}"
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
IMAGE             : ${IMAGE}
MASK              : ${MASK}
CONTROL           : ${CONTROL}
PREVIEW           : ${PREVIEW}
SAMPLE_METHOD     : ${SAMPLE_METHOD} // overrides QUALITY if set
SAMPLING_STEPS    : ${SAMPLING_STEPS}
SCHEDULE_METHOD   : ${SCHEDULE_METHOD}
SEED              : ${SEED}
GUIDANCE          : ${GUIDANCE}
STRENGTH          : ${STRENGTH}
CFG_SCALE         : ${CFG_SCALE}
NEGATIVE_PROMPT   : ${NEGATIVE_PROMPT}
=====================================================

EOF
: >"${LOG_FILE}" 2>/dev/null || true

ROOT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd -P)"

edit() {
    local prompt="$1" run_id
    local img="${IMAGE#@}"
    if [[ ! -f "${img}" ]]; then
        echo "Image not found: ${img}" && return 1
    fi
    # multipart form: every generation knob is a flattened field
    # (reference multipart parser httpserver.hpp:1818-1844)
    local -a form=(
        --form "prompt=${prompt}"
        --form "n=${N}"
        --form "response_format=b64_json"
        --form "size=${SIZE}"
        --form "image=@${img}"
        --form "stream=true"
        --form "stream_options_preview=${PREVIEW}"
        --form "stream_options_chunk_result=${CHUNK}"
        --form "stream_options_chunk_size=262144"
    )
    if [[ "${SAMPLE_METHOD}" != "null" ]]; then
        form+=(
            --form "sample_method=${SAMPLE_METHOD}"
            --form "sample_steps=${SAMPLING_STEPS}"
            --form "schedule_method=${SCHEDULE_METHOD}"
            --form "seed=${SEED}"
            --form "guidance=${GUIDANCE}"
            --form "strength=${STRENGTH}"
            --form "cfg_scale=${CFG_SCALE}"
            --form "negative_prompt=${NEGATIVE_PROMPT}"
        )
    else
        form+=(--form "quality=${QUALITY}" --form "strength=${STRENGTH}")
    fi
    if [[ -n "${MASK}" ]]; then
        local msk="${MASK#@}"
        if [[ ! -f "${msk}" ]]; then
            echo "Mask not found: ${msk}" && return 1
        fi
        form+=(--form "mask=@${msk}")
    fi
    if [[ -n "${CONTROL}" ]]; then
        local ctl="${CONTROL#@}"
        if [[ ! -f "${ctl}" ]]; then
            echo "Control image not found: ${ctl}" && return 1
        fi
        form+=(--form "control=@${ctl}")
    fi
    printf 'Q: multipart prompt=%s image=%s mask=%s control=%s\n' \
        "${prompt}" "${img}" "${MASK}" "${CONTROL}" >>"${LOG_FILE}"
    run_id="$(date +%s)"
    curl -s --no-buffer -X POST "${API_URL}/v1/images/edits" \
        "${form[@]}" | tee -a "${LOG_FILE}" |
        python3 "${ROOT_DIR}/_image_sse.py" \
            "image_edit_${run_id}" "${OUT_DIR}" "$(date +%s)"
    printf '\n'
}

if [[ -z "${IMAGE}" ]]; then
    echo "IMAGE=<file> is required" && exit 1
fi
if [[ $# -ge 1 ]]; then
    echo "> $*"
    edit "$*"
else
    while IFS= read -r -e -p "> " PROMPT; do
        [[ "${PROMPT}" == "exit" || "${PROMPT}" == "quit" ]] && break
        [[ -z "${PROMPT}" ]] && continue
        edit "${PROMPT}"
    done
fi
