#!/usr/bin/env bash
# Reference-binary differential check (see README.md in this directory).
# Usage: tools/ref_differential/run.sh /path/to/kanzi-go [python]
# Requires: Go 1.21+, a kanzi-go v2.5.x checkout, and (for the our-encode
# direction) python with this repo importable. Produces fixtures/ +
# MANIFEST.json; exit 0 = both runnable directions verified.
set -euo pipefail

KANZI_GO=${1:?usage: run.sh /path/to/kanzi-go [python]}
PY=${2:-python3}
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "$HERE/../.." && pwd)
CORPUS="$REPO/tests/fixtures/golden_corpus.bin"
FIX="$HERE/fixtures"
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT

# 1. build the reference CLI (reference README build instructions)
echo "== building reference binary"
(cd "$KANZI_GO/v2/app" && go build -o "$WORK/kanzi" \
    Kanzi.go BlockCompressor.go BlockDecompressor.go InfoPrinter.go)
KZ="$WORK/kanzi"
REF_VERSION=$(cd "$KANZI_GO" && git describe --tags --always 2>/dev/null || echo unknown)

mkdir -p "$FIX"
CORPUS_SHA=$(sha256sum "$CORPUS" | cut -d' ' -f1)

# config table: name | our-CLI flags | ref-CLI flags (shared surface)
# levels 1-9 + per-codec chains (covers all 9 entropy codecs)
CONFIGS=(
  "level1|-l 1"  "level2|-l 2"  "level3|-l 3"  "level4|-l 4"
  "level5|-l 5"  "level6|-l 6"  "level7|-l 7"  "level8|-l 8"  "level9|-l 9"
  "range_chain|-t RLT+LZ -e RANGE -b 64k"
  "bwts_chain|-t BWTS+MTFT+ZRLT -e ANS1 -b 64k"
  "fpaq_chain|-t EXE+MM+PACK -e FPAQ -b 64k"
  "cksum64|-l 5 -x64"
)

MANIFEST="$FIX/MANIFEST.json"
echo "{" > "$MANIFEST"
echo " \"corpus_sha256\": \"$CORPUS_SHA\"," >> "$MANIFEST"
echo " \"reference_version\": \"$REF_VERSION\"," >> "$MANIFEST"
echo " \"fixtures\": {" >> "$MANIFEST"

FIRST=1
for entry in "${CONFIGS[@]}"; do
  name=${entry%%|*}; flags=${entry#*|}
  echo "== $name ($flags)"
  # 2. reference encodes the pinned corpus -> fixture
  rm -f "$FIX/ref_$name.knz"
  $KZ -c -i "$CORPUS" -o "$FIX/ref_$name.knz" $flags -f -v 0
  # 3. sanity: reference decodes its own stream back to the corpus
  $KZ -d -i "$FIX/ref_$name.knz" -o "$WORK/ref_rt.bin" -f -v 0
  cmp "$CORPUS" "$WORK/ref_rt.bin"
  # 4. our encode -> reference decode
  (cd "$REPO" && $PY -m kanzi_tpu.app -c -i "$CORPUS" \
      -o "$WORK/ours_$name.knz" $flags -f -v 0)
  $KZ -d -i "$WORK/ours_$name.knz" -o "$WORK/ours_rt.bin" -f -v 0
  cmp "$CORPUS" "$WORK/ours_rt.bin"
  sha=$(sha256sum "$FIX/ref_$name.knz" | cut -d' ' -f1)
  [ $FIRST = 1 ] && FIRST=0 || echo "  ," >> "$MANIFEST"
  echo -n "  \"ref_$name.knz\": {\"sha256\": \"$sha\", \"flags\": \"$flags\"}" >> "$MANIFEST"
  echo >> "$MANIFEST"
done
echo " }" >> "$MANIFEST"
echo "}" >> "$MANIFEST"

echo "== all configs verified (ref self-roundtrip + our-encode->ref-decode)"
echo "== fixtures written to $FIX; run the remaining direction with:"
echo "   python -m pytest tests/test_ref_differential.py -q"
