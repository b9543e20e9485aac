"""Device speculative frame segmentation (ops/segment.py): the sync-code +
CRC-8 scan must recover exactly the C++ walker's frame boundaries on real
streams (reference `src/frame.rs:146-149,291-302` design properties)."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from claxon_tpu import native
from claxon_tpu.testing import encode_flac, synth_music

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native core not built")


def _stream_words(payload):
    buf = np.frombuffer(bytes(payload), np.uint8)
    pad = np.zeros((-len(buf)) % 4, np.uint8)
    return np.concatenate([buf, pad]).view(">i4").astype(np.int32)


def _scan(payload, max_candidates=4096):
    import jax.numpy as jnp
    from claxon_tpu.ops.segment import find_frame_headers

    words = _stream_words(payload)
    pos, ok, count, _win = find_frame_headers(jnp.asarray(words),
                                              len(payload), max_candidates)
    return np.asarray(pos), np.asarray(ok), int(count)


@pytest.mark.parametrize("spec", [
    dict(block_size=4096, seed=31),
    dict(block_size=1152, seed=32, max_lpc_order=2),
    dict(block_size=4096, seed=33, rice2=True, partition_order=4),
])
def test_finds_all_walker_boundaries(spec):
    seed = spec.pop("seed")
    data = encode_flac(synth_music(4096 * 6, channels=2, bps=16, seed=seed),
                       44100, 16, **spec)
    si, bb = native.extract_stream_bits(data, emit_slots=False)
    from claxon_tpu.native.binding import _read_metadata
    _si, fpos = _read_metadata(data)
    payload = data[fpos:]
    true_starts = set(int(x) for x in bb.bframes["byte0"])

    pos, ok, count = _scan(payload)
    assert count <= len(pos), "capacity overflow"
    found = set(int(p) for p, o in zip(pos, ok) if o and p >= 0)
    # Every true boundary must be found...
    assert true_starts <= found, sorted(true_starts - found)[:5]
    # ...and payload bytes that mimic a CRC-8-valid header are rare (a
    # full speculative decoder resolves them by chaining + CRC-16).
    assert len(found - true_starts) <= max(4, len(true_starts) // 8), \
        sorted(found - true_starts)[:10]


def test_candidate_positions_are_stream_ordered():
    data = encode_flac(synth_music(1024 * 5, channels=1, bps=16, seed=34),
                       44100, 16, block_size=1024)
    from claxon_tpu.native.binding import _read_metadata
    _si, fpos = _read_metadata(data)
    pos, ok, count = _scan(data[fpos:])
    live = pos[pos >= 0]
    assert np.array_equal(live, np.sort(live))
    assert count == len(live)


def test_no_sync_no_candidates():
    payload = bytes(range(128)) * 16  # never contains 0xFF F8/F9
    pos, ok, count = _scan(payload)
    assert count == 0 and not ok.any()


def test_empty_and_tiny_streams():
    pos, ok, count = _scan(b"")
    assert count == 0 and not ok.any()
    pos, ok, count = _scan(b"\xff")
    assert count == 0 and not ok.any()


@pytest.mark.parametrize("spec", [
    dict(channels=1, bps=16, block_size=576),
    dict(channels=2, bps=24, block_size=2048),
])
def test_finds_boundaries_varied_formats(spec):
    data = encode_flac(synth_music(4096 * 3, seed=35, channels=spec.pop(
        "channels"), bps=spec["bps"]), 44100, spec.pop("bps"), **spec)
    si, bb = native.extract_stream_bits(data, emit_slots=False)
    from claxon_tpu.native.binding import _read_metadata
    _si, fpos = _read_metadata(data)
    pos, ok, count = _scan(data[fpos:])
    found = set(int(p) for p, o in zip(pos, ok) if o and p >= 0)
    true_starts = set(int(x) for x in bb.bframes["byte0"])
    assert true_starts <= found


def test_sync_heavy_payload_false_positives_bounded():
    """Saturated audio maximizes 0xFF runs (sync-pattern hits) in the
    payload; the CRC-8 gate must keep validated false positives rare."""
    rng = np.random.default_rng(36)
    pcm = np.where(rng.random((4096 * 4, 1)) < 0.5, -32768,
                   rng.integers(-32768, 32768, (4096 * 4, 1))).astype(
                       np.int64)
    data = encode_flac(pcm, 44100, 16, block_size=4096)
    si, bb = native.extract_stream_bits(data, emit_slots=False)
    from claxon_tpu.native.binding import _read_metadata
    _si, fpos = _read_metadata(data)
    pos, ok, count = _scan(data[fpos:], max_candidates=16384)
    found = set(int(p) for p, o in zip(pos, ok) if o and p >= 0)
    true_starts = set(int(x) for x in bb.bframes["byte0"])
    assert true_starts <= found
    assert len(found - true_starts) <= max(8, count // 16)
