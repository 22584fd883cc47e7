#!/usr/bin/env bash
# Build the native cores ahead of time (they also build lazily on first
# use). Delegates to the single build recipe in kio/native_decode.py so
# compiler flags live in exactly one place.
set -euo pipefail
cd "$(dirname "$0")/.."
PYTHONPATH=. python - <<'EOF'
from tf_kaldi_speaker_tpu.kio.native_decode import build_native_lib
for src, so in (("ark_decoder.cpp", "libarkdecode.so"),
                ("wfst_decoder.cpp", "libwfstdecode.so")):
    build_native_lib(src, so)
    print("built tf_kaldi_speaker_tpu/native/" + so)
EOF
