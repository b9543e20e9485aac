"""Fuzz-crash regression corpus + poisoned-buffer determinism.

Mirrors the reference's tier-4 strategy (`tests/testsamples.rs:498-540`):
every committed past-crash file must decode to either a clean result or a
``claxon_tpu.Error`` -- never another exception (Python path), never a
crash (C++ path). The poisoned-buffer test replays the reference's `diff`
fuzzer idea (`fuzz/fuzzers/diff.rs:27-78`): decoding the same block into
buffers pre-filled with different markers must give identical results,
proving no output element leaks buffer contents (the 0.4.1 CVE-class bug,
reference `changelog.md:53-58`).
"""

import pathlib

import numpy as np
import pytest

from claxon_tpu import FlacReader, native
from claxon_tpu.error import Error
from claxon_tpu.frame import FrameReader
from claxon_tpu.io.readers import MemReader
from claxon_tpu.reader import read_stream_header

FUZZ_DIR = pathlib.Path("/root/reference/testsamples/fuzz")

fuzz_files = (sorted(FUZZ_DIR.glob("*.flac")) if FUZZ_DIR.is_dir() else [])


@pytest.mark.parametrize("path", fuzz_files, ids=lambda p: p.name)
def test_fuzz_sample_python_path(path):
    data = path.read_bytes()
    try:
        for _ in FlacReader(data).samples():
            pass
    except Error:
        pass  # graceful decode error: exactly what the contract requires


@pytest.mark.parametrize("path", fuzz_files, ids=lambda p: p.name)
def test_fuzz_sample_native_extract(path):
    if not native.available():
        pytest.skip("C++ core not built")
    data = path.read_bytes()
    try:
        native.extract_stream(data)
        native.decode_stream_scalar(data)
    except Error:
        pass


@pytest.mark.parametrize("path", fuzz_files, ids=lambda p: p.name)
def test_fuzz_sample_error_parity(path):
    """Python and native paths must fail (or succeed) identically."""
    if not native.available():
        pytest.skip("C++ core not built")
    from claxon_tpu.extract import extract_stream

    data = path.read_bytes()

    def outcome(fn):
        try:
            fn(data)
            return ("ok",)
        except Error as e:
            return (type(e).__name__, str(e))

    assert outcome(extract_stream) == outcome(native.extract_stream)


def _first_blocks_with_poison(data, marker, max_blocks=4):
    """Decode up to ``max_blocks`` blocks, each into a buffer pre-filled
    with ``marker``; returns the list of per-block sample arrays."""
    reader = MemReader(data)
    try:
        read_stream_header(reader)
        from claxon_tpu.metadata import MetadataBlockReader
        for _ in MetadataBlockReader(reader):
            pass
    except Error:
        return []  # malformed before the first frame: nothing to compare
    fr = FrameReader(reader)
    out = []
    # Poison the FIRST block's buffer too: stale-memory exposure confined
    # to frame 0 must also be caught (reference `fuzz/fuzzers/diff.rs`).
    buf = np.full(65535 * 8, marker, dtype=np.int32)
    for _ in range(max_blocks):
        if buf is not None:
            buf[:] = marker  # poison the recycled buffer
        try:
            block = fr.read_next_or_eof(buf)
        except Error:
            break
        if block is None:
            break
        out.append(np.array([block.channel(c)
                             for c in range(block.channels())]))
        buf = block.into_buffer()
    return out


@pytest.mark.parametrize("path", fuzz_files[:8] + [
    pathlib.Path("/root/reference/testsamples/pop.flac"),
    pathlib.Path("/root/reference/testsamples/wasted_bits.flac"),
], ids=lambda p: p.name)
def test_poisoned_buffer_determinism(path):
    """The 13-filled and 17-filled decode results must be identical
    (reference `tests/testsamples.rs:520-540`)."""
    if not path.exists():
        pytest.skip("sample not available")
    data = path.read_bytes()
    a = _first_blocks_with_poison(data, 13)
    b = _first_blocks_with_poison(data, 17)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
