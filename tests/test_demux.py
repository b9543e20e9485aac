"""Device demux walk (ops.demux.walk_frames) vs the C++ boundary walker.

The native walker's BitsBatch descriptors are the oracle: on the same
stream, the device walk must reproduce order/shift/wasted/ps/pbits/
flags/n_parts, warm-up values, coefficients, per-partition Rice
parameters, chunk base bit positions, and frame end bytes exactly.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from claxon_tpu import native
from claxon_tpu.testing import encode_flac, synth_music

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native core unavailable")


def _stream_words(payload):
    """Big-endian packed int32 words of a frame-section payload."""
    buf = np.frombuffer(payload, np.uint8)
    pad = (-len(buf)) % 4
    if pad:
        buf = np.concatenate([buf, np.zeros(pad, np.uint8)])
    return buf.view(">i4").astype(np.int32)


def _frame_section(flac):
    si, pos = native.binding._read_metadata(flac)
    return si, bytes(flac[pos:])


def _walk_on_device(payload, t_bucket):
    """Run host header parse + device walk over every frame of a payload;
    returns (fields, out, end_bits, ok, bb) with bb the native oracle."""
    import jax

    from claxon_tpu.ops.demux import walk_frames
    from claxon_tpu.pipeline_seg import host_header_fields

    bb = native.extract_frames_bits(payload, emit_slots=False,
                                    defer_crc=True)
    bf = bb.bframes
    fields = host_header_fields(np.frombuffer(payload, np.uint8),
                                bf["byte0"])
    assert fields["ok"].all()
    assert np.array_equal(fields["block_size"], bf["block_size"])
    assert np.array_equal(fields["nch"], bf["channels"])
    assert np.array_equal(fields["mode"], bf["mode"])

    start_bits = (bf["byte0"].astype(np.int64) + fields["hlen"]) * 8
    nch = int(bf["channels"][0])
    bps = bf["bps"].astype(np.int32)
    out, end_bits, ok = walk_frames(
        jax.numpy.asarray(_stream_words(payload)),
        start_bits.astype(np.int32),
        bf["block_size"].astype(np.int32),
        bf["mode"].astype(np.int32), bps, T=t_bucket, nch=nch)
    return fields, jax.tree_util.tree_map(np.asarray, out), \
        np.asarray(end_bits), np.asarray(ok), bb


def _check_against_oracle(payload, t_bucket, exact=True):
    fields, out, end_bits, ok, bb = _walk_on_device(payload, t_bucket)
    bf, subs = bb.bframes, bb.bsubs
    # The device walk's accept set is a SUBSET of the native walker's
    # bits-path set: the device window is 32 bits (ops/demux.py module
    # docstring) vs the C++ walker's 64, so frames with longer codes
    # (high-bps content) leave the device path -- but never the reverse.
    native_ok = (bf["flags"] & 1) == 0
    assert not (ok & ~native_ok).any()
    if exact:
        # On <= 16-bit corpora every code fits the device window, so the
        # sets must match exactly (drift tripwire).
        assert np.array_equal(ok, native_ok)
    nch = int(bf["channels"][0])
    ok_lane = np.repeat(ok, nch)
    # Frame ends: byte1 = aligned end + 2 CRC bytes (ok frames only; the
    # walk's cursor is unreliable past a rejected code).
    assert np.array_equal((end_bits // 8 + 2)[ok], bf["byte1"][ok])
    for f in ("order", "shift", "wasted", "n_parts", "ps", "pbits",
              "flags"):
        assert np.array_equal(out[f][ok_lane], subs[f][ok_lane]), f
    assert np.array_equal(out["warm"][ok_lane], subs["warm"][ok_lane])
    assert np.array_equal(out["coefs"][ok_lane], subs["coefs"][ok_lane])
    # ks: flat in the oracle (ALL lanes consume ks), (L, 64) on device.
    ko = 0
    for l, npart in enumerate(subs["n_parts"]):
        if ok_lane[l]:
            want = bb.ks[ko:ko + npart]
            assert np.array_equal(out["ks"][l, :npart], want), l
            assert not out["ks"][l, npart:].any()
        ko += npart
    # Chunk bases: every non-fallback lane emits nc of them (constant
    # lanes record the subframe end for all chunks, like the walker's
    # finish()).
    bo = 0
    nc_f = (bf["block_size"] + 31) // 32
    li = 0
    for fi in range(len(bf)):
        for ch in range(int(bf["channels"][fi])):
            nc = int(nc_f[fi])
            if native_ok[fi]:
                want = bb.bases[bo:bo + nc]
                if ok[fi]:
                    got = out["bases"][li, :nc]
                    assert np.array_equal(got, want), (fi, ch)
                bo += nc
            li += 1
    assert bo == len(bb.bases)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(block_size=1024, max_lpc_order=12, partition_order=4),
    dict(force_subframe="constant"),
    dict(force_subframe="verbatim"),
    dict(force_subframe="fixed"),
    dict(stereo="independent"),
    dict(stereo="left_side"),
    dict(stereo="right_side"),
    dict(bps=8, partition_order=0),
    dict(bps=24, block_size=512),
])
def test_walk_matches_native_walker(kw):
    n = 6000
    if kw.get("force_subframe") == "constant":
        pcm = np.full((n, 2), -137, np.int32)
    else:
        pcm = synth_music(n, channels=2, bps=kw.get("bps", 16), seed=5)
    enc = dict(kw)
    enc.pop("bps", None)
    flac = encode_flac(pcm, 44100, kw.get("bps", 16),
                       block_size=enc.pop("block_size", 4096), **enc)
    si, payload = _frame_section(flac)
    t_bucket = max(int(b["block_size"])
                   for b in native.extract_frames_bits(
                       payload, emit_slots=False,
                       defer_crc=True).bframes)
    # 24-bit residues use k ~ 20: many codes exceed the device's 32-bit
    # window, so those frames legitimately leave the device path
    # (subset semantics); <= 16-bit corpora must match exactly.
    _check_against_oracle(payload, t_bucket, exact=kw.get("bps", 16) <= 16)


def test_walk_mono():
    pcm = synth_music(5000, channels=1, bps=16, seed=9)
    flac = encode_flac(pcm, 44100, 16, block_size=1024)
    si, payload = _frame_section(flac)
    _check_against_oracle(payload, 1024)


def test_walk_traces_at_65535_bucket():
    """The 65535 bucket is the one T that is not a multiple of 32: the
    per-code k/delta emissions are chunk-padded to NC*32 and must be
    sliced back to T (regression: reshape(F, T) raised TypeError at
    trace time, crashing the segmented/auto path on any stream with
    STREAMINFO max_block_size in (32768, 65535])."""
    import jax
    import jax.numpy as jnp

    from claxon_tpu.ops.demux import walk_frames

    stream = jax.ShapeDtypeStruct((4096,), jnp.int32)
    f = jax.ShapeDtypeStruct((2,), jnp.int32)
    out, end, ok = jax.eval_shape(
        lambda s, a, b, c, d: walk_frames(s, a, b, c, d, T=65535, nch=2),
        stream, f, f, f, f)
    assert end.shape == (2,)
    assert out["ks"].shape[0] == 4  # F * nch lanes


def test_walk_flags_escaped_partition_not_ok():
    """A hand-built subframe with an escaped Rice partition must flag
    ok=False (the host path then raises the reference's error)."""
    import jax
    import jax.numpy as jnp

    from claxon_tpu.ops.demux import walk_frames

    # Build a tiny fake "subframe": pad(0) type(6b=8: fixed order 0)
    # wasted(0) -> residual method 0, po=0, k=0b1111 escape.
    bits = "0" + "001000" + "0" + "00" + "0000" + "1111" + "0" * 64
    word_bits = bits + "0" * ((-len(bits)) % 32)
    words = np.array([int(word_bits[i:i + 32], 2)
                      for i in range(0, len(word_bits), 32)],
                     np.uint32).astype(np.int32)
    out, end, ok = walk_frames(
        jnp.asarray(words), np.zeros(1, np.int32),
        np.array([32], np.int32), np.zeros(1, np.int32),
        np.array([16], np.int32), T=64, nch=1)
    assert not np.asarray(ok)[0]
