#!/usr/bin/env bash
# Download the published darknet weights (reference ships an equivalent
# script, SURVEY.md §2.12). Files land next to the .cfg assets.
# NOTE: this build environment has no network egress; run elsewhere and copy.
set -euo pipefail
cd "$(dirname "$0")"

fetch() {
    local url="$1" out="$2" size="$3"
    if [[ -f "$out" ]]; then
        echo "$out already present"; return
    fi
    echo "downloading $out ($size)..."
    curl -fL --retry 3 -o "$out" "$url" || wget -O "$out" "$url"
}

fetch https://pjreddie.com/media/files/yolov3.weights      yolov3.weights      "236 MB"
fetch https://pjreddie.com/media/files/yolov3-tiny.weights yolov3-tiny.weights "34 MB"
fetch https://pjreddie.com/media/files/yolov3-spp.weights  yolov3-spp.weights  "240 MB"

# integrity: expected byte sizes (20-byte header + 4*param_count; see
# yolov3_tpu/weights.py::param_count and tests/test_weights.py)
check() {
    local f="$1" want="$2"
    [[ -f "$f" ]] || return 0
    local got
    got=$(stat -c%s "$f" 2>/dev/null || stat -f%z "$f")
    if [[ "$got" != "$want" ]]; then
        echo "WARNING: $f is $got bytes, expected $want" >&2
    fi
}
check yolov3.weights      248007048
check yolov3-tiny.weights 35434956
check yolov3-spp.weights  252209544
echo "done"
