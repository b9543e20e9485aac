"""The committed self-verifying corpus (testsamples/generated/): every
decode path must reproduce the STREAMINFO MD5 on every file, hermetically
(no reference checkout or external binaries needed)."""

import pathlib

import numpy as np
import pytest

from claxon_tpu import FlacReader, native
from claxon_tpu.pipeline import decode_stream
from util import decode_all_blocks, interleave, pcm_md5

CORPUS = pathlib.Path(__file__).resolve().parent.parent / "testsamples" / \
    "generated"

files = sorted(CORPUS.glob("*.flac")) if CORPUS.is_dir() else []
assert files, "committed corpus missing; run tools/gen_corpus.py"


@pytest.mark.parametrize("path", files, ids=lambda p: p.name)
def test_scalar_path_md5(path):
    reader = FlacReader.open(path)
    si = reader.streaminfo()
    pcm = interleave(decode_all_blocks(reader))
    assert pcm_md5(pcm, si.bits_per_sample) == si.md5sum


@pytest.mark.parametrize("path", files, ids=lambda p: p.name)
def test_pipeline_md5(path):
    dec = decode_stream(path.read_bytes())
    si = dec.streaminfo
    assert pcm_md5(dec.pcm, si.bits_per_sample) == si.md5sum


@pytest.mark.parametrize("path", files, ids=lambda p: p.name)
def test_native_scalar_md5(path):
    if not native.available():
        pytest.skip("C++ core not built")
    si, pcm = native.decode_stream_scalar(path.read_bytes())
    assert pcm_md5(pcm, si.bits_per_sample) == si.md5sum
