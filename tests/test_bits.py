"""Bits-path tests: the boundary-only C++ extraction
(native.extract_stream_bits), the device entropy kernel (ops.entropy), and
the fused bits pipeline (pipeline_bits) must all be bit-exact against the
legacy sample-shipping path and the STREAMINFO MD5 oracle."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from claxon_tpu import native
from claxon_tpu.ops.entropy import (decode_residual_bits,
                                    decode_residual_bits_reference)
from claxon_tpu.pipeline import decode_streams, decode_streams_device
from claxon_tpu.testing import encode_flac, synth_music
from util import pcm_md5

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native core not built")

GENERATED = pathlib.Path(__file__).resolve().parents[1] / "testsamples" / \
    "generated"


def reconstruct_lane(sub, bs, SA, d, ks, slots):
    """Numpy mirror of the device kernel for one lane (independent
    implementation of the delta/slot contract)."""
    order = int(sub["order"])
    n_parts = int(sub["n_parts"])
    ps = int(sub["ps"])
    pb = int(sub["pbits"])
    verb = bool(sub["flags"] & 1)
    t = np.arange(bs)
    p = np.minimum(t // ps, n_parts - 1) if ps else np.zeros(bs, np.int64)
    k = ks[p].astype(np.int64)
    o = np.cumsum(d) - d
    ol = o - o[(t >> 5) << 5]
    first = t == np.where(p == 0, order, p * ps)
    q = d - 1 - k - np.where(first, pb, 0)
    rpos = ol + d - k
    wi = np.minimum(rpos >> 5, SA - 1)
    off = (rpos & 31).astype(np.uint64)
    c = t >> 5
    w0 = slots[c, wi].astype(np.uint64)
    w1 = slots[c, np.minimum(wi + 1, SA - 1)].astype(np.uint64)
    win = (((w0 << np.uint64(32)) | w1) << off) >> np.uint64(32)
    r = np.where(k > 0, win >> np.maximum(32 - k, 1).astype(np.uint64),
                 np.uint64(0))
    if verb:
        sign = np.uint64(1) << np.maximum(k - 1, 0).astype(np.uint64)
        return ((r ^ sign).astype(np.int64) - sign.astype(np.int64)) \
            .astype(np.int32)
    v = ((q.astype(np.uint64) << k.astype(np.uint64)) | r) \
        & np.uint64(0xFFFFFFFF)
    return np.where(v & np.uint64(1),
                    ~(v >> np.uint64(1)) & np.uint64(0xFFFFFFFF),
                    v >> np.uint64(1)).astype(np.uint32).view(np.int32)


def walk_bits_batch(bb):
    """Iterate (frame_idx, ch, sub, views) over a BitsBatch's lanes."""
    d_off = s_off = k_off = x_off = 0
    lane = 0
    for fi in range(len(bb.bframes)):
        f = bb.bframes[fi]
        bs, nch = int(f["block_size"]), int(f["channels"])
        SA = int(f["s_class"]) + 1
        fallback = bool(f["flags"] & 1)
        for ch in range(nch):
            sub = bb.bsubs[lane]
            if fallback:
                x = bb.samples[x_off:x_off + bs]
                x_off += bs
                yield fi, ch, sub, ("fallback", x)
            else:
                nc = int(sub["n_chunks"])
                d = bb.deltas[d_off:d_off + bs].astype(np.int64)
                ks = bb.ks[k_off:k_off + int(sub["n_parts"])]
                slots = bb.slots[s_off:s_off + nc * SA] \
                    .view(np.uint32).reshape(nc, SA)
                d_off += bs
                k_off += int(sub["n_parts"])
                s_off += nc * SA
                yield fi, ch, sub, ("bits", bs, SA, d, ks, slots)
            lane += 1


def assert_bits_extraction_matches(data):
    """The bits extraction must reconstruct exactly the legacy extractor's
    per-lane samples (warm-up ++ residuals)."""
    si, bb = native.extract_stream_bits(data)
    si2, frames_buf, subs_buf, samples = native.extract_stream_raw(data)
    assert len(bb.bframes) == len(frames_buf)
    lx = 0
    lane = 0
    for fi, ch, sub, payload in walk_bits_batch(bb):
        bs = int(bb.bframes[fi]["block_size"])
        ref_x = samples[lx:lx + bs]
        lx += bs
        if payload[0] == "fallback":
            assert np.array_equal(payload[1], ref_x)
        else:
            _, bs_, SA, d, ks, slots = payload
            order = int(sub["order"])
            if subs_buf[lane]["order"] == 0 and order == 1 \
                    and not (sub["flags"] & 1):
                # constant-as-order-1 rewrite
                assert sub["warm"][0] == ref_x[0]
                assert np.all(ref_x == ref_x[0]) and np.all(d == 0)
            else:
                assert np.array_equal(np.asarray(sub["warm"][:order]),
                                      ref_x[:order])
                res = reconstruct_lane(sub, bs, SA, d, ks, slots)
                mask = d > 0
                assert np.array_equal(res[mask], ref_x[mask])
        lane += 1
    return bb


@pytest.mark.parametrize("name", sorted(
    p.name for p in GENERATED.glob("*.flac")))
def test_bits_extraction_generated_corpus(name):
    assert_bits_extraction_matches((GENERATED / name).read_bytes())


@pytest.mark.parametrize("name", ["pop.flac", "short.flac",
                                  "wasted_bits.flac", "non_subset.flac"])
def test_bits_extraction_committed(testsamples, name):
    assert_bits_extraction_matches((testsamples / name).read_bytes())


@pytest.mark.parametrize("kw", [
    dict(),
    dict(force_subframe="verbatim"),
    dict(force_subframe="fixed"),
    dict(max_lpc_order=32, lpc_precision=15),
    dict(rice2=True, partition_order=4),
    dict(block_size=1000),          # block size not a multiple of 32
    dict(block_size=96, max_lpc_order=2, partition_order=1),
    dict(variable_blocking=True),
], ids=lambda kw: str(sorted(kw.items())))
def test_bits_extraction_generated(kw):
    pcm = synth_music(9000, channels=2, bps=16, seed=21)
    assert_bits_extraction_matches(encode_flac(pcm, 44100, 16, **kw))


def test_bits_kernel_matches_numpy_reference():
    """Device kernel vs the pure-Python oracle on a hand-built batch."""
    rng = np.random.default_rng(7)
    L, NC, SA, P = 4, 4, 9, 4
    T = NC * 32
    # Build synthetic lanes through the encoder for realism: extract a
    # real stream and re-pad it into kernel-shaped arrays.
    pcm = synth_music(T * 2, channels=1, bps=16, seed=5)
    data = encode_flac(pcm, 44100, 16, block_size=T, partition_order=2)
    _si, bb = native.extract_stream_bits(data)
    lanes = [pl for _fi, _ch, _s, pl in walk_bits_batch(bb)
             if pl[0] == "bits"]
    subs = [s for _fi, _ch, s, pl in walk_bits_batch(bb)
            if pl[0] == "bits"]
    L = len(lanes)
    SA = max(pl[2] for pl in lanes)
    slots = np.zeros((L, NC, SA), np.int32)
    deltas = np.zeros((L, T), np.uint8)
    ks = np.zeros((L, P), np.int32)
    ps = np.zeros(L, np.int32)
    orders = np.zeros(L, np.int32)
    pbits = np.zeros(L, np.int32)
    vflags = np.zeros(L, np.int32)
    warm = np.zeros((L, 32), np.int32)
    for i, (pl, sub) in enumerate(zip(lanes, subs)):
        _, bs, sa_i, d, k_row, sl = pl
        slots[i, :sl.shape[0], :sa_i] = sl.view(np.int32)
        deltas[i, :bs] = d
        ks[i, :len(k_row)] = k_row
        ps[i] = sub["ps"]
        orders[i] = sub["order"]
        pbits[i] = sub["pbits"]
        vflags[i] = sub["flags"] & 1
        warm[i] = sub["warm"]
    got = np.asarray(decode_residual_bits(
        slots, deltas, ks, ps, orders, pbits, vflags, warm, n_parts_max=P))
    want = decode_residual_bits_reference(
        slots, deltas, ks, ps, orders, pbits, vflags, warm, n_parts_max=P)
    assert np.array_equal(got, want)


def _md5_ok(dec):
    si = dec.streaminfo
    return pcm_md5(dec.pcm, si.bits_per_sample) == si.md5sum


def test_bits_pipeline_end_to_end_corpus():
    datas = [p.read_bytes() for p in sorted(GENERATED.glob("*.flac"))]
    for dec in decode_streams(datas):
        assert _md5_ok(dec)


def test_stream_kernel_matches_reference():
    """The stream-gather scan kernel vs its pure-Python oracle on a real
    encoded stream (covers rice, verbatim, constant, partition switches)."""
    from claxon_tpu.ops.entropy import (
        decode_residual_bits_stream, decode_residual_bits_stream_reference)

    pcm = synth_music(4096 * 3, channels=2, bps=16, seed=9)
    data = encode_flac(pcm, 44100, 16, block_size=4096, partition_order=3)
    si, bb = native.extract_stream_bits(data, emit_slots=False)
    payload = bytes(bb.payload)
    pad = (-len(payload)) % 4
    stream = np.frombuffer(payload + b"\x00" * pad, dtype=">i4") \
        .astype(np.int32)

    L = len(bb.bsubs)
    NC = int(bb.bsubs["n_chunks"].max())
    SA = int(bb.bframes["s_class"].max()) + 1
    P = int(bb.bsubs["n_parts"].max())
    bases = np.zeros((L, NC), np.int32)
    ks = np.zeros((L, P), np.int32)
    b_off = k_off = 0
    for i, sub in enumerate(bb.bsubs):
        nc, nparts = int(sub["n_chunks"]), int(sub["n_parts"])
        bases[i, :nc] = bb.bases[b_off:b_off + nc]
        ks[i, :nparts] = bb.ks[k_off:k_off + nparts]
        b_off += nc
        k_off += nparts
    lengths = np.repeat(bb.bframes["block_size"],
                        bb.bframes["channels"]).astype(np.int32)
    args = (stream, bases, ks, bb.bsubs["ps"], bb.bsubs["order"],
            bb.bsubs["pbits"], bb.bsubs["flags"], bb.bsubs["warm"], lengths)
    got = np.asarray(decode_residual_bits_stream(*args, n_parts_max=P,
                                                 sa=SA))
    want = decode_residual_bits_stream_reference(*args, n_parts_max=P)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("entropy", ["stream", "delta"])
def test_entropy_modes_end_to_end(monkeypatch, entropy):
    monkeypatch.setenv("CLAXON_TPU_ENTROPY", entropy)
    datas = [p.read_bytes() for p in sorted(GENERATED.glob("*.flac"))]
    for dec in decode_streams(datas):
        assert _md5_ok(dec)


def test_bits_pipeline_matches_legacy_path(monkeypatch):
    """CLAXON_TPU_NO_BITS selects the sample-shipping path; both paths
    must produce identical DecodedStreams."""
    pcm = synth_music(20000, channels=2, bps=16, seed=33)
    datas = [encode_flac(pcm, 44100, 16, block_size=1152,
                         partition_order=2),
             encode_flac(pcm, 44100, 16, force_subframe="verbatim")]
    bits = decode_streams(datas)
    monkeypatch.setenv("CLAXON_TPU_NO_BITS", "1")
    legacy = decode_streams(datas)
    for a, b in zip(bits, legacy):
        assert np.array_equal(a.pcm, b.pcm)
        assert a.frame_times == b.frame_times
        assert a.frame_sizes == b.frame_sizes


def test_bits_fallback_many_partitions():
    """Partition order > 6 exceeds the kernel's cap; the walker decodes
    those frames host-side and the pipeline still matches the oracle."""
    pcm = synth_music(16384, channels=2, bps=16, seed=44)
    data = encode_flac(pcm, 44100, 16, block_size=16384, max_lpc_order=4,
                       partition_order=7)
    _si, bb = native.extract_stream_bits(data)
    assert np.any(bb.bframes["flags"] & 1), "expected fallback frames"
    dec = decode_streams([data])[0]
    assert _md5_ok(dec)


def test_bits_mixed_fallback_and_bits_frames():
    """Streams mixing verbatim (bits path since round 2) with sane frames
    plus a high-partition fallback frame decode exactly."""
    pcm = synth_music(12000, channels=2, bps=16, seed=55)
    parts = [encode_flac(pcm[:4096], 44100, 16, block_size=4096,
                         partition_order=7, max_lpc_order=4),
             encode_flac(pcm[4096:8192], 44100, 16, block_size=4096),
             encode_flac(pcm[8192:], 44100, 16,
                         force_subframe="verbatim", block_size=4096)]
    for data in parts:
        assert _md5_ok(decode_streams([data])[0])


def test_bits_device_resident_sync():
    pcm = synth_music(8000, channels=2, bps=16, seed=66)
    data = encode_flac(pcm, 44100, 16)
    dev = decode_streams_device([data])
    dev.sync()
    res = dev.to_host()
    assert _md5_ok(res[0])


# ---------------------------------------------------------------------------
# Device CRC-16 verification (stream mode defers the frame CRC check to
# ops.crc.crc16_frames_device; reference error `src/frame.rs` "frame CRC
# mismatch" wording).


def _first_frame_span(data):
    """(abs_byte0, abs_byte1) of frame 0, via a host-verified walk
    (defer_crc defaults to False)."""
    si, bb = native.extract_stream_bits(data, emit_slots=False)
    from claxon_tpu.native.binding import _read_metadata
    _si, pos = _read_metadata(data)
    f0 = bb.bframes[0]
    return pos + int(f0["byte0"]), pos + int(f0["byte1"])


def test_device_crc_flags_corrupt_frame():
    from claxon_tpu.error import FormatError

    data = encode_flac(synth_music(4096 * 3, channels=2, bps=16, seed=77),
                       44100, 16, block_size=4096)
    b0, b1 = _first_frame_span(data)
    bad = bytearray(data)
    bad[b1 - 1] ^= 0xFF  # stored CRC byte: frame still parses
    with pytest.raises(FormatError, match="frame CRC mismatch"):
        decode_streams_device([bytes(bad)]).to_host()
    # sync() is the device-resident consumers' barrier; it must raise too.
    with pytest.raises(FormatError, match="frame CRC mismatch"):
        decode_streams_device([bytes(bad)]).sync()
    # The clean stream still decodes bit-exact with deferral on.
    dec = decode_streams_device([data]).to_host()[0]
    _si, pcm = native.decode_stream_scalar(data)
    assert np.array_equal(dec.pcm, pcm)


def test_device_crc_failure_latches():
    """A caught CRC error must not be one-shot: a later to_host() on the
    same batch re-raises instead of silently returning corrupt PCM."""
    from claxon_tpu.error import FormatError

    data = encode_flac(synth_music(1024 * 2, channels=2, bps=16, seed=81),
                       44100, 16, block_size=1024)
    b0, b1 = _first_frame_span(data)
    bad = bytearray(data)
    bad[b1 - 1] ^= 0xFF
    dd = decode_streams_device([bytes(bad)])
    with pytest.raises(FormatError, match="frame CRC mismatch"):
        dd.verify_crc()
    with pytest.raises(FormatError, match="frame CRC mismatch"):
        dd.to_host()
    with pytest.raises(FormatError, match="frame CRC mismatch"):
        dd.sync()


def test_device_crc_host_knob(monkeypatch):
    from claxon_tpu.error import FormatError

    data = encode_flac(synth_music(1024 * 2, channels=1, bps=16, seed=78),
                       44100, 16, block_size=1024)
    b0, b1 = _first_frame_span(data)
    bad = bytearray(data)
    bad[b1 - 1] ^= 0xFF
    monkeypatch.setenv("CLAXON_TPU_HOST_CRC", "1")
    # Host verification: the walker itself raises, before any device work.
    with pytest.raises(FormatError, match="frame CRC mismatch"):
        decode_streams_device([bytes(bad)])


def test_deferred_crc_precedes_later_walk_error():
    """Reference order parity: a CRC-corrupt frame BEFORE a malformed
    frame must surface "frame CRC mismatch" (the sequential reference
    hits it first), even though the deferred walk only discovers the
    malformed frame."""
    from claxon_tpu.error import Error

    data = encode_flac(synth_music(1024 * 3, channels=1, bps=16, seed=79),
                       44100, 16, block_size=1024)
    b0, b1 = _first_frame_span(data)
    bad = bytearray(data[:b1 + 7])  # truncate mid-frame-1: walk error
    bad[b1 - 1] ^= 0xFF             # and corrupt frame 0's CRC
    with pytest.raises(Error) as ei:
        decode_streams_device([bytes(bad)]).to_host()
    assert "frame CRC mismatch" in str(ei.value)


def test_container_decode_device_crc():
    from claxon_tpu.error import FormatError
    from claxon_tpu.containers import decode_ogg_stream
    from claxon_tpu.testing.containers_gen import mux_ogg_flac

    data = encode_flac(synth_music(1024 * 2, channels=2, bps=16, seed=80),
                       44100, 16, block_size=1024)
    b0, b1 = _first_frame_span(data)
    bad = bytearray(data)
    bad[b1 - 1] ^= 0xFF
    with pytest.raises(FormatError, match="frame CRC mismatch"):
        decode_ogg_stream(mux_ogg_flac(bytes(bad)))


def test_decode_streams_device_empty_batch():
    from claxon_tpu.pipeline import decode_streams_device

    assert decode_streams_device([]).to_host() == []


def test_delta_mode_rejects_deferred_crc_batches():
    """Internal contract: a BitsBatch extracted with defer_crc must take
    stream mode (the verifier reads the stream upload)."""
    from claxon_tpu.pipeline_bits import decode_raw_bits_device

    data = encode_flac(synth_music(1024, channels=1, bps=16, seed=90),
                       44100, 16, block_size=1024)
    si, bb = native.extract_stream_bits(data, emit_slots=True,
                                        defer_crc=True)
    with pytest.raises(RuntimeError, match="defer_crc"):
        decode_raw_bits_device([(si, bb)], mode="delta")
