"""SSE consumer for the image client scripts (image_generate.sh /
image_edit.sh): reads an /v1/images/* event stream on stdin, shows
per-image progress, reassembles (possibly chunked) b64 payloads into PNG
files, and prints the usage report (reference clients' parse() loop —
python here because the image is jq-less).

Usage: ... | python3 _image_sse.py <prefix> <out_dir> <t_start_epoch>
"""

import base64
import json
import sys
import time


def main() -> int:
    prefix = sys.argv[1] if len(sys.argv) > 1 else "image"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    t_start = float(sys.argv[3]) if len(sys.argv) > 3 else time.time()
    acc: dict[tuple[int, int], str] = {}   # (index, progressed) -> b64

    for raw in sys.stdin:
        line = raw.rstrip("\n")
        if line.startswith("error: "):
            print(f"Error: {line[7:]}")
            return 1
        if not line.startswith("data: "):
            continue
        if line.startswith("data: [DONE]"):
            break
        try:
            ev = json.loads(line[6:])
        except json.JSONDecodeError:
            print(f"Error: {line[6:]}")
            return 1
        items = ev.get("data") or []
        if not items:
            print(f"Error: {json.dumps(ev)}")
            return 1
        it = items[0]
        idx = it.get("index", 0)
        done_steps = it.get("progressed_steps", 0)
        print(f"{idx}: {it.get('progress', 0.0):6.2f}%...",
              end="\r", flush=True)
        b64 = it.get("b64_json") or ""
        if b64:
            key = (idx, done_steps)
            acc[key] = acc.get(key, "") + b64
            png = f"{out_dir}/{prefix}_{idx}.png"
            try:
                with open(png, "wb") as f:
                    f.write(base64.b64decode(acc[key]))
            except Exception:  # noqa: BLE001 — partial chunk, not yet valid
                pass
            if it.get("finish_reason") == "stop":
                print(f"\nGenerated image: {png}")
        usage = ev.get("usage")
        if usage:
            print("\n------------------------")
            print(f"- TTP  : {usage.get('time_to_process_ms', 0):10.2f}ms  -")
            print(f"- TPG  : {usage.get('time_per_generation_ms', 0):10.2f}"
                  "ms  -")
            print(f"- GPS  : {usage.get('generation_per_second', 0):10.2f}"
                  "    -")
            print(f"- TC   : {time.time() - t_start:10.2f}s   -")
            print("------------------------")
    return 0


if __name__ == "__main__":
    sys.exit(main())
