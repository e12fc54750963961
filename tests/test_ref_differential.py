"""Ingestion side of the reference-binary differential check.

tools/ref_differential/run.sh (run in a Go-capable environment — this
image has no Go toolchain) produces `tools/ref_differential/fixtures/
ref_*.knz`: the reference binary's encodings of the pinned golden corpus,
already verified there in the our-encode→ref-decode direction. This test
performs the remaining direction locally: every fixture must decode,
through OUR Reader, to the pinned corpus bytes. Skips when no fixtures
are present, so the suite stays green without Go while the differential
check becomes real the moment fixtures are dropped in.

Reference: SURVEY §4 ("the gold-standard test is differential"),
/root/reference/README.md:121-129 (build recipe used by run.sh).
"""

import glob
import hashlib
import json
import os

import pytest

import kanzi_tpu

HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(HERE, "..", "tools", "ref_differential", "fixtures")
CORPUS_PATH = os.path.join(HERE, "fixtures", "golden_corpus.bin")

_fixtures = sorted(glob.glob(os.path.join(FIXDIR, "ref_*.knz")))


@pytest.mark.skipif(not _fixtures,
                    reason="no reference-binary fixtures present "
                           "(generate with tools/ref_differential/run.sh "
                           "in a Go-capable environment)")
@pytest.mark.parametrize("path", _fixtures,
                         ids=[os.path.basename(p) for p in _fixtures])
def test_reference_stream_decodes(path):
    corpus = open(CORPUS_PATH, "rb").read()
    manifest_path = os.path.join(FIXDIR, "MANIFEST.json")
    if os.path.exists(manifest_path):
        manifest = json.load(open(manifest_path))
        assert manifest["corpus_sha256"] == \
            hashlib.sha256(corpus).hexdigest(), (
                "fixtures were generated against a different corpus")
        entry = manifest["fixtures"].get(os.path.basename(path))
        if entry:
            blob = open(path, "rb").read()
            assert hashlib.sha256(blob).hexdigest() == entry["sha256"], (
                f"{path} does not match its manifest hash")
    out = kanzi_tpu.decompress(open(path, "rb").read())
    assert out == corpus, (
        f"our Reader decoded {os.path.basename(path)} to different bytes "
        f"than the reference encoded — format divergence")
