#!/usr/bin/env bash
# Build the native cores ahead of time (they also build lazily on first
# use from kio/native_decode.py and backend/decoder.py; this script just
# front-loads the g++ invocation, e.g. for containers baking an image).
set -euo pipefail
cd "$(dirname "$0")/../tf_kaldi_speaker_tpu/native"
g++ -O3 -march=native -shared -fPIC -std=c++17 ark_decoder.cpp -o libarkdecode.so
g++ -O3 -march=native -shared -fPIC -std=c++17 wfst_decoder.cpp -o libwfstdecode.so
echo "built: $(pwd)/libarkdecode.so $(pwd)/libwfstdecode.so"
