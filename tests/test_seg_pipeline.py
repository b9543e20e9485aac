"""Segmented (device-demux) decode path vs the host-walk path.

Every stream must decode bit-identically through both; streams the
device walk cannot represent must fall back transparently; adversarial
payloads (embedded header mimics, corrupt CRCs, truncation) must never
corrupt output or change error behavior.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from claxon_tpu import native
from claxon_tpu.error import Error
from claxon_tpu.testing import encode_flac, synth_music

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not native.available(),
                                 reason="native core unavailable")]


def _seg(datas):
    from claxon_tpu.pipeline_seg import decode_streams_segmented
    return decode_streams_segmented(datas)


def _host(datas):
    from claxon_tpu.pipeline import decode_streams_device
    return decode_streams_device(datas)


def _assert_equal(datas):
    want = _host(datas).to_host()
    dd = _seg(datas)
    got = dd.to_host()
    for w, g in zip(want, got):
        assert np.array_equal(w.pcm, g.pcm)
        assert w.frame_times == g.frame_times
        assert w.frame_sizes == g.frame_sizes
    return dd


@pytest.mark.parametrize("kw", [
    dict(),
    dict(block_size=1024, max_lpc_order=12, partition_order=4),
    dict(stereo="independent"),
    dict(stereo="left_side"),
    dict(stereo="right_side"),
    dict(force_subframe="verbatim"),
    dict(force_subframe="fixed"),
    dict(bps=8, block_size=192),
    dict(bps=24, block_size=512),
    dict(variable_blocking=True),
    dict(rice2=True, partition_order=3),
])
def test_segmented_matches_host(kw):
    bps = kw.pop("bps", 16)
    pcm = synth_music(7000, channels=2, bps=bps, seed=3)
    bs = kw.pop("block_size", 4096)
    _assert_equal([encode_flac(pcm, 44100, bps, block_size=bs, **kw)])


def test_segmented_mixed_batch():
    datas = []
    for seed, (bs, ch) in enumerate([(4096, 2), (1024, 1), (576, 2),
                                     (4096, 2), (2048, 1)]):
        pcm = synth_music(5000 + 619 * seed, channels=ch, bps=16,
                          seed=seed)
        datas.append(encode_flac(pcm, 44100, 16, block_size=bs))
    dd = _assert_equal(datas)
    # The batch must actually have ridden the segmented path (several
    # decode dispatches, walk-planned).
    assert dd.dispatches


@pytest.mark.parametrize("mode", ["values", "delta", "scan"])
def test_seg_entropy_modes_match(mode, monkeypatch):
    # The three decode sources (walk-decoded values / delta re-read /
    # in-chunk re-scan) must be bit-identical; the non-default kernels
    # only stay honest if they keep differential coverage.
    monkeypatch.setenv("CLAXON_TPU_SEG_ENTROPY", mode)
    datas = []
    for seed, (bs, ch) in enumerate([(4096, 2), (576, 1)]):
        pcm = synth_music(4000 + 619 * seed, channels=ch, bps=16,
                          seed=seed)
        datas.append(encode_flac(pcm, 44100, 16, block_size=bs,
                                 partition_order=3))
    _assert_equal(datas)


def test_segmented_constant_frames():
    pcm = np.full((5000, 2), 1234, np.int32)
    _assert_equal([encode_flac(pcm, 44100, 16, block_size=1024,
                               force_subframe="constant")])


def test_segmented_wasted_bits():
    pcm = (synth_music(6000, channels=2, bps=16, seed=8) & ~7)
    _assert_equal([encode_flac(pcm, 44100, 16, block_size=1024)])


def test_segmented_falls_back_on_many_partitions(monkeypatch):
    """Partition order 7 (128 partitions) exceeds the device cap; the
    batch must fall back to the host walk and stay bit-exact."""
    import claxon_tpu.pipeline_seg as ps

    pcm = synth_music(9000, channels=2, bps=16, seed=4)
    flac = encode_flac(pcm, 44100, 16, block_size=4096, partition_order=7)
    calls = []
    orig = ps._seg_decode_program
    monkeypatch.setattr(ps, "_seg_decode_program",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    _assert_equal([flac])


def test_segmented_65535_bucket_numeric():
    """A stream whose STREAMINFO max_block_size lands in the 65535
    bucket (the one T that is not a multiple of 32) must decode through
    the device walk bit-exactly -- numerically, not just trace-clean
    (the eval_shape regression in test_demux.py caught the round-4
    reshape TypeError but not the emission slicing). Two frames so the
    test encoder records the real block size (it writes 16/16 when the
    only frame is also the last)."""
    pcm = synth_music(80000, channels=1, bps=16, seed=65)
    data = encode_flac(pcm, 44100, 16, block_size=40000)
    dd = _assert_equal([data])
    assert getattr(dd, "segmented", False), \
        "65535-bucket stream did not ride the device walk"


def test_reject_cache_preroutes_repeat_decodes():
    """A stream that walk-rejects (128 partitions) is learned per
    process: a repeated decode pre-routes it to the per-stream host
    fallback, skipping its group-upload bytes and wasted walk lanes,
    with identical results."""
    import claxon_tpu.pipeline_seg as ps

    good = encode_flac(synth_music(6000, channels=2, bps=16, seed=315),
                       44100, 16, block_size=4096)
    odd = encode_flac(synth_music(6000, channels=2, bps=16, seed=314),
                      44100, 16, block_size=4096, partition_order=7)
    dd1 = ps.decode_streams_segmented([good, odd])
    r1 = dd1.to_host()
    assert dd1.fallback_streams == [1]
    pend = ps.begin_segmented([good, odd])
    assert pend.pre_fallback == [1]
    dd2 = ps.finish_segmented(pend)
    r2 = dd2.to_host()
    for a, b in zip(r1, r2):
        assert np.array_equal(a.pcm, b.pcm)
    # The rejecting stream's bytes ride the link once now, not twice.
    assert dd2.upload_bytes < dd1.upload_bytes


def test_segmented_header_mimic_in_verbatim_payload():
    """A verbatim subframe whose SAMPLES spell a fully valid-looking
    frame header (sync + plausible fields + correct CRC-8) must not
    confuse the segmented path: the mimic loses the chain race."""
    from claxon_tpu.crc import CRC8_TABLE

    # Build a fake header byte string: sync FFF8, bs/sr=0x99
    # (bs_code 9 -> 512, sr 44.1k), chan/bps=0x18 (2ch indep, 16 bps),
    # frame number 0, then its valid CRC-8.
    hdr = bytearray([0xFF, 0xF8, 0x99, 0x18, 0x00])
    crc = 0
    for b in hdr:
        crc = CRC8_TABLE[crc ^ b]
    hdr.append(crc)
    # Embed as big-endian 16-bit sample pairs in channel 0 (with
    # independent channels, a verbatim ch0's samples sit byte-aligned:
    # the frame header is byte-aligned and the subframe header is
    # exactly 8 bits).
    vals = np.frombuffer(bytes(hdr), ">i2").astype(np.int32)
    pcm = synth_music(3000, channels=2, bps=16, seed=6)
    pcm[100:100 + len(vals), 0] = vals
    flac = encode_flac(pcm, 44100, 16, block_size=1024,
                       force_subframe="verbatim", stereo="independent")
    # The mimic must really be in the payload for the test to bite.
    assert bytes(hdr) in flac
    _assert_equal([flac])


def test_segmented_crc_mismatch_raises():
    pcm = synth_music(5000, channels=2, bps=16, seed=7)
    flac = bytearray(encode_flac(pcm, 44100, 16, block_size=1024))
    # Corrupt the last byte (a CRC-16 byte of the final frame).
    flac[-1] ^= 0xFF
    dd = _seg([bytes(flac)])
    with pytest.raises(Error) as ei:
        dd.to_host()
    assert "frame CRC mismatch" in str(ei.value)


def test_segmented_truncated_stream_matches_host_error():
    pcm = synth_music(5000, channels=2, bps=16, seed=7)
    flac = encode_flac(pcm, 44100, 16, block_size=1024)
    bad = flac[:len(flac) - 7]
    with pytest.raises(Error) as e_host:
        _host([bad]).to_host()
    with pytest.raises(Error) as e_seg:
        _seg([bad]).to_host()
    assert str(e_seg.value) == str(e_host.value)


def test_segmented_empty_stream():
    pcm = synth_music(1, channels=1, bps=16, seed=1)[:0]
    flac = encode_flac(pcm.reshape(0, 1), 44100, 16)
    dd = _seg([flac])
    out = dd.to_host()
    assert out[0].pcm.shape[0] == 0


def test_segmented_on_reference_samples():
    datas = [open(f"/root/reference/testsamples/{n}", "rb").read()
             for n in ("pop.flac", "short.flac", "wasted_bits.flac")]
    _assert_equal(datas)


def _gen_batches(n_batches, per_batch=2):
    batches = []
    for b in range(n_batches):
        batch = []
        for k in range(per_batch):
            pcm = synth_music(3000 + 500 * b + 123 * k, channels=2,
                              bps=16, seed=100 * b + k)
            batch.append(encode_flac(pcm, 44100, 16, block_size=1024))
        batches.append(batch)
    return batches


def test_async_overlapped_batches_match_and_keep_order():
    """Two segmented batches in flight at once (begin n+1 before finish n,
    the bench/pipelined overlap pattern) decode bit-identically and keep
    per-batch stream order."""
    from claxon_tpu.pipeline import decode_streams_device_async

    batches = _gen_batches(3)
    want = [[s.pcm for s in _host(b).to_host()] for b in batches]
    handles = []
    pending = None
    done = []
    for b in batches:
        h = decode_streams_device_async(b, segmentation="device")
        if pending is not None:
            done.append(pending.finish())
        pending = h
        handles.append(h)
    done.append(pending.finish())
    for dd, w in zip(done, want):
        assert getattr(dd, "segmented", False)
        got = dd.to_host()
        for g, wp in zip(got, w):
            assert np.array_equal(g.pcm, wp)
    # finish() is idempotent (returns the same DeviceDecoded).
    assert handles[0].finish() is done[0]


def test_async_fallback_handle_works():
    """A batch the device walk cannot represent still returns a working
    handle (eager host-walk decode behind it), bit-exact."""
    from claxon_tpu.pipeline import decode_streams_device_async

    pcm = synth_music(9000, channels=2, bps=16, seed=4)
    flac = encode_flac(pcm, 44100, 16, block_size=4096, partition_order=7)
    want = _host([flac]).to_host()
    dd = decode_streams_device_async([flac], segmentation="device").finish()
    assert not getattr(dd, "segmented", False)
    got = dd.to_host()
    assert np.array_equal(got[0].pcm, want[0].pcm)


def test_pipelined_corpus_segmented(monkeypatch):
    """decode_streams_pipelined with device segmentation: overlapping
    segmented batches across a corpus, results in input order."""
    monkeypatch.setenv("CLAXON_TPU_SEGMENTATION", "device")
    from claxon_tpu.pipeline import decode_streams_pipelined

    datas = [d for b in _gen_batches(3) for d in b]
    monkeypatch.delenv("CLAXON_TPU_SEGMENTATION", raising=False)
    want = [s.pcm for s in _host(datas).to_host()]
    monkeypatch.setenv("CLAXON_TPU_SEGMENTATION", "device")
    got = decode_streams_pipelined(datas, batch_streams=2, depth=2)
    for g, w in zip(got, want):
        assert np.array_equal(g.pcm, w)


def test_sync_saturated_payload_falls_back():
    """A payload that is mostly sync patterns (verbatim samples of
    0xFFF8) would need more candidate lanes than MAX_CAP allows the walk
    to materialize; the batch must hand off to the host walk (bounded
    memory -- the DoS guard) and stay bit-exact."""
    import claxon_tpu.ops.seg_parse as sp

    # Alternate 0x01FF / 0xF801 samples: the big-endian byte stream is
    # 01 FF F8 01 ... -- an FF F8 sync at every sample pair, and the odd
    # low bits keep the encoder's wasted-bits transform off.
    n = sp.MAX_CAP + sp.MAX_CAP // 4
    pcm = np.zeros((n, 2), np.int32)
    pcm[0::2] = 0x01FF
    pcm[1::2] = 0xF801 - 0x10000
    flac = encode_flac(pcm, 44100, 16, block_size=4096,
                       force_subframe="verbatim", stereo="independent")
    b = np.frombuffer(flac, np.uint8)
    assert ((b[:-1] == 255) & ((b[1:] & 0xFE) == 0xF8)).sum() > sp.MAX_CAP
    want = _host([flac]).to_host()
    dd = _seg([flac])
    assert not getattr(dd, "segmented", False)
    got = dd.to_host()
    assert np.array_equal(want[0].pcm, got[0].pcm)


def test_per_stream_fallback_keeps_batch_on_device():
    """One walk-rejected stream (128 partitions > device cap) in a
    16-stream batch: the other 15 must stay on the device path (the
    batch marker stays set, only that stream is listed as fallen back)
    and the upload must not re-pay the clean streams (VERDICT r3 item 3:
    < 1.2x the clean case)."""
    clean = []
    for k in range(15):
        pcm = synth_music(5500 + 137 * k, channels=2, bps=16, seed=30 + k)
        clean.append(encode_flac(pcm, 44100, 16, block_size=1024))
    pcm = synth_music(9000, channels=2, bps=16, seed=4)
    odd = encode_flac(pcm, 44100, 16, block_size=4096, partition_order=7)
    batch = clean[:7] + [odd] + clean[7:]

    base = _seg(clean)
    assert getattr(base, "segmented", False)
    assert base.fallback_streams == []
    base.to_host()

    dd = _assert_equal(batch)
    assert getattr(dd, "segmented", False)
    assert dd.fallback_streams == [7]
    # Upload accounting: the clean streams' bytes are paid once; only
    # the odd stream's bytes ride the link twice (demux try + host walk).
    assert dd.upload_bytes < 1.2 * (base.upload_bytes + len(odd))


def test_per_stream_fallback_chain_break():
    """A stream whose payload breaks the candidate chain (truncated tail
    inside a batch) host-walks ALONE and surfaces the reference error,
    while the other streams' device results stay intact."""
    from claxon_tpu.error import Error as _Err

    good = [encode_flac(synth_music(3000 + 311 * k, channels=2, bps=16,
                                    seed=60 + k), 44100, 16,
                        block_size=1024) for k in range(3)]
    bad = encode_flac(synth_music(5000, channels=2, bps=16, seed=7),
                      44100, 16, block_size=1024)
    bad = bad[:len(bad) - 7]
    with pytest.raises(_Err) as e_host:
        _host([bad]).to_host()
    with pytest.raises(_Err) as e_seg:
        _seg(good + [bad]).to_host()
    assert str(e_seg.value) == str(e_host.value)


def test_auto_segmentation_calibrates_and_matches():
    """segmentation="auto" returns bit-exact results, caches a per-
    process choice after the first engaging batch, and uses it after."""
    import claxon_tpu.pipeline as pl

    saved = pl._SEG_AUTO["choice"]
    pl._SEG_AUTO["choice"] = None
    try:
        datas = [encode_flac(synth_music(3000 + 200 * k, channels=2,
                                         bps=16, seed=80 + k), 44100, 16,
                             block_size=1024) for k in range(3)]
        want = [s.pcm for s in _host(datas).to_host()]
        dd = pl.decode_streams_device(datas, segmentation="auto")
        got = dd.to_host()
        for g, w in zip(got, want):
            assert np.array_equal(g.pcm, w)
        assert pl._SEG_AUTO["choice"] in ("host", "device")
        # Second call rides the cached choice (no recalibration).
        got2 = pl.decode_streams_device(datas, segmentation="auto")
        for g, w in zip(got2.to_host(), want):
            assert np.array_equal(g.pcm, w)
    finally:
        pl._SEG_AUTO["choice"] = saved


def test_host_fallback_lane_quantum(monkeypatch):
    """Round-4 review: whole-batch fallbacks must keep the caller's
    quantum (an 8-lane quantum would mint a fresh compile class per
    batch composition), and lane_quantum=None must resolve to the
    default rather than TypeError; per-stream fallbacks clamp to 8."""
    import claxon_tpu.pipeline as pl
    import claxon_tpu.pipeline_seg as ps

    seen = []
    real = pl.decode_streams_device

    def spy(datas, use_native=True, lane_quantum=pl._L_QUANTUM,
            segmentation=None):
        seen.append(lane_quantum)
        return real(datas, use_native, lane_quantum, segmentation)

    monkeypatch.setattr(pl, "decode_streams_device", spy)
    data = encode_flac(synth_music(1500, channels=2, bps=16, seed=5),
                       44100, 16, block_size=1024)
    ps._host_fallback([data], None).to_host()
    ps._host_fallback([data], 128, per_stream=True).to_host()
    assert seen == [pl._L_QUANTUM, 8]


def test_auto_caches_host_when_demux_engages_but_all_streams_fall_back():
    """A corpus whose every stream walk-rejects (128 partitions > the
    device cap) engages the fused demux and then falls back entirely;
    auto must cache "host" so later batches don't re-pay the doomed
    upload + demux + summary round trip."""
    import claxon_tpu.pipeline as pl

    saved = pl._SEG_AUTO["choice"]
    pl._SEG_AUTO["choice"] = None
    try:
        odd = [encode_flac(synth_music(9000 + 37 * k, channels=2, bps=16,
                                       seed=90 + k), 44100, 16,
                           block_size=4096, partition_order=7)
               for k in range(2)]
        want = [s.pcm for s in _host(odd).to_host()]
        dd = pl.decode_streams_device(odd, segmentation="auto")
        for g, w in zip(dd.to_host(), want):
            assert np.array_equal(g.pcm, w)
        assert pl._SEG_AUTO["choice"] == "host"
    finally:
        pl._SEG_AUTO["choice"] = saved


def test_auto_does_not_cache_on_shape_rejection():
    """A cheap shape rejection (3 channels) must NOT pin the process
    choice: a later corpus may engage and win on device."""
    import claxon_tpu.pipeline as pl

    saved = pl._SEG_AUTO["choice"]
    pl._SEG_AUTO["choice"] = None
    try:
        pcm = synth_music(2000, channels=3, bps=16, seed=11)
        data = encode_flac(pcm, 44100, 16, block_size=1024)
        pl.decode_streams_device([data], segmentation="auto").to_host()
        assert pl._SEG_AUTO["choice"] is None
    finally:
        pl._SEG_AUTO["choice"] = saved


def test_segmented_sharded_non_pow2_mesh():
    """The seg path's sharded programs must accept a 3-device mesh: the
    CRC frame-axis padding starts from lcm(8, n_devices), so doubling
    never produces an axis the mesh cannot divide."""
    from claxon_tpu.parallel.mesh import make_mesh
    from claxon_tpu.pipeline_seg import decode_streams_segmented

    datas = [encode_flac(synth_music(2600 + 301 * k, channels=2, bps=16,
                                     seed=70 + k), 44100, 16,
                         block_size=1024) for k in range(3)]
    want = _host(datas).to_host()
    dd = decode_streams_segmented(datas, mesh=make_mesh(3))
    assert getattr(dd, "segmented", False)
    for w, g in zip(want, dd.to_host()):
        assert np.array_equal(w.pcm, g.pcm)


def test_sharded_auto_is_honored():
    """segmentation="auto" on decode_streams_sharded must calibrate (or
    reuse) the per-process choice, not silently take the host walk."""
    import claxon_tpu.pipeline as pl
    from claxon_tpu.parallel.mesh import make_mesh, decode_streams_sharded

    saved = pl._SEG_AUTO["choice"]
    pl._SEG_AUTO["choice"] = None
    try:
        datas = [encode_flac(synth_music(2000 + 100 * k, channels=2,
                                         bps=16, seed=40 + k), 44100, 16,
                             block_size=1024) for k in range(2)]
        want = [s.pcm for s in _host(datas).to_host()]
        got = decode_streams_sharded(datas, mesh=make_mesh(2),
                                     segmentation="auto")
        for g, w in zip(got, want):
            assert np.array_equal(g.pcm, w)
        assert pl._SEG_AUTO["choice"] in ("host", "device")
    finally:
        pl._SEG_AUTO["choice"] = saved


def test_multichannel_stream_falls_back_per_stream():
    """A > 2-channel stream cannot ride the device demux (2-lane stereo
    decorrelation), but it must host-walk ALONE -- the stereo streams in
    the same batch stay on the device path (round-5: previously one such
    stream rejected the whole batch)."""
    st = [encode_flac(synth_music(3000, channels=2, bps=16, seed=40 + k),
                      44100, 16, block_size=1024) for k in range(2)]
    multi = encode_flac(synth_music(2000, channels=3, bps=16, seed=44),
                        44100, 16, block_size=1024)
    datas = [st[0], multi, st[1]]
    dd = _seg(datas)
    res = dd.to_host()
    assert getattr(dd, "segmented", False)
    assert dd.fallback_streams == [1]
    from claxon_tpu import native as _n
    for data, dec in zip(datas, res):
        _si, pcm = _n.decode_stream_scalar(data)
        assert np.array_equal(dec.pcm, pcm)


def test_group_merge_mixed_shapes_single_upload():
    """Streams with different block-size buckets (within the 4x merge
    ratio) and equal channel count must share ONE fused-demux group --
    one upload, one summary round trip -- and still decode bit-exactly
    with per-frame decode buckets."""
    import claxon_tpu.pipeline_seg as ps

    datas = [encode_flac(synth_music(2500, channels=2, bps=16, seed=50),
                         44100, 16, block_size=576),
             encode_flac(synth_music(2500, channels=2, bps=16, seed=51),
                         44100, 16, block_size=1024),
             encode_flac(synth_music(2500, channels=2, bps=16, seed=52),
                         44100, 16, block_size=2048)]
    pending = ps.begin_segmented(datas)
    assert pending is not None
    assert len(pending.groups) == 1, \
        [g[:2] for g in pending.groups]
    dd = ps.finish_segmented(pending)
    assert getattr(dd, "segmented", False)
    assert not dd.fallback_streams
    from claxon_tpu import native as _n
    for data, dec in zip(datas, dd.to_host()):
        _si, pcm = _n.decode_stream_scalar(data)
        assert np.array_equal(dec.pcm, pcm)
