"""Fused device demux (ops.seg_parse) vs the host header-field oracle.

The fused program's header-field parse must agree column by column with
``pipeline_seg.host_header_fields`` (the host twin, itself tested
against the scalar frame decoder in test_demux.py), and its candidate
chain must tile each stream exactly.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from claxon_tpu import native
from claxon_tpu.testing import encode_flac, synth_music

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not native.available(),
                                 reason="native core unavailable")]


def _group_buffer(datas):
    """Assemble the word-aligned group upload exactly as the pipeline
    does; returns (buf, byte_off, sizes, sis)."""
    from claxon_tpu.native.binding import _read_metadata
    from claxon_tpu.pipeline_bits import _STREAM_QUANTUM

    sis, payloads = [], []
    for d in datas:
        si, pos = _read_metadata(d)
        sis.append(si)
        payloads.append(np.frombuffer(d, np.uint8)[pos:])
    sizes = [p.nbytes for p in payloads]
    wcs = [(s + 3) // 4 for s in sizes]
    total_q = -(-max(sum(wcs), 1) // _STREAM_QUANTUM) * _STREAM_QUANTUM
    buf = np.zeros(total_q * 4, np.uint8)
    byte_off = np.zeros(len(datas), np.int64)
    off = 0
    for k, (p, s, wc) in enumerate(zip(payloads, sizes, wcs)):
        buf[off:off + s] = p
        byte_off[k] = off
        off += wc * 4
    return buf, byte_off, sizes, sis


def _fused(datas, T, nch):
    import jax.numpy as jnp

    from claxon_tpu.ops.seg_parse import SUMMARY_COLS, fused_demux

    buf, byte_off, sizes, sis = _group_buffer(datas)
    ends = byte_off + np.asarray(sizes, np.int64)
    _, _, summary, count = fused_demux(
        jnp.asarray(buf.view(np.int32)), buf.nbytes, T, nch, ends,
        [si.bits_per_sample for si in sis])
    cols = {name: summary[:, k].astype(np.int64)
            for k, name in enumerate(SUMMARY_COLS)}
    return buf, byte_off, sizes, sis, cols, count


def test_fused_fields_match_host_oracle():
    from claxon_tpu.pipeline_seg import host_header_fields

    datas = [encode_flac(synth_music(6000, channels=2, bps=16, seed=s),
                         44100, 16, block_size=1024)
             for s in range(3)]
    buf, byte_off, sizes, sis, cols, count = _fused(datas, 1024, 2)
    assert count >= 3 * 6  # at least the real frames (6000/1024 each)

    want = host_header_fields(buf, cols["pos"])
    ok_h = want["ok"].astype(bool)
    ok_d = cols["valid"] != 0
    # Device valid = host parse validity AND group-shape walkability
    # (nch matches, block size fits the bucket): strictly stricter.
    assert not (ok_d & ~ok_h).any()
    # Every real frame start must be device-valid; frame 0 of each
    # stream sits at its byte_off.
    for k in range(len(datas)):
        hit = np.flatnonzero(cols["pos"] == byte_off[k])
        assert hit.size == 1 and ok_d[hit[0]]
    for k_d, k_h in (("block_size", "block_size"), ("mode", "mode"),
                     ("variable", "variable"), ("hlen", "hlen"),
                     ("nch_hdr", "nch")):
        np.testing.assert_array_equal(cols[k_d][ok_h], want[k_h][ok_h],
                                      err_msg=k_d)
    time_d = cols["time_hi"][ok_h] << 32 | (cols["time_lo"][ok_h]
                                            & 0xFFFFFFFF)
    np.testing.assert_array_equal(time_d, want["time_raw"][ok_h])
    assert (cols["bps"][ok_h] == 16).all()  # streaminfo resolution


def test_fused_chain_tiles_each_stream():
    datas = [encode_flac(synth_music(9000, channels=1, bps=16, seed=9),
                         44100, 16, block_size=4096)]
    buf, byte_off, sizes, sis, cols, count = _fused(datas, 4096, 1)
    ok = (cols["valid"] != 0) & (cols["walk_ok"] != 0)
    pos = cols["pos"][ok]
    end = cols["end_byte"][ok] + 2
    assert pos[0] == 0 and int(end[-1]) == sizes[0]
    np.testing.assert_array_equal(end[:-1], pos[1:])


def test_fused_time_raw_large_sample_number():
    """Variable-block streams store the SAMPLE number: force one large
    enough to need the summary's 32-bit split (> 2^31)."""
    from claxon_tpu.pipeline_seg import host_header_fields

    from claxon_tpu.crc import CRC8_TABLE

    hdr = bytearray([0xFF, 0xF9, 0xA9, 0x08])  # variable, bs 1024, 1ch
    big = 0x9_8765_4321  # 36-bit sample number
    # UTF-8 encode (7 bytes: FE + 6 continuation bytes).
    enc = [0xFE] + [0x80 | ((big >> (6 * k)) & 0x3F)
                    for k in range(5, -1, -1)]
    hdr += bytes(enc)
    crc = 0
    for b in hdr:
        crc = CRC8_TABLE[crc ^ b]
    hdr.append(crc)
    buf = np.zeros(1 << 18, np.uint8)
    buf[:len(hdr)] = np.frombuffer(bytes(hdr), np.uint8)
    want = host_header_fields(buf, np.asarray([0]))
    assert int(want["time_raw"][0]) == big

    import jax.numpy as jnp

    from claxon_tpu.ops.seg_parse import SUMMARY_COLS, fused_demux
    _, _, summary, count = fused_demux(
        jnp.asarray(buf.view(np.int32)), buf.nbytes, 4096, 1,
        np.asarray([buf.nbytes], np.int64), [16])
    cols = {name: summary[:, k].astype(np.int64)
            for k, name in enumerate(SUMMARY_COLS)}
    hit = np.flatnonzero(cols["pos"] == 0)
    assert hit.size == 1
    t = (cols["time_hi"][hit[0]] << 32) | (cols["time_lo"][hit[0]]
                                           & 0xFFFFFFFF)
    assert int(t) == big


def test_cap_overflow_regrows(monkeypatch):
    """A candidate count past the initial capacity (an understated
    STREAMINFO frame estimate, a sync-dense payload) must transparently
    re-dispatch with a larger class and stay bit-exact."""
    import claxon_tpu.ops.seg_parse as sp
    from claxon_tpu.pipeline import decode_streams_device
    from claxon_tpu.pipeline_seg import decode_streams_segmented
    from claxon_tpu.testing import encode_flac, synth_music

    pcm = synth_music(20000, channels=2, bps=16, seed=11)
    flac = encode_flac(pcm, 44100, 16, block_size=576)  # ~35 frames
    want = decode_streams_device([flac], segmentation="host").to_host()

    grown = []
    monkeypatch.setattr(sp, "pick_cap", lambda *a: 8)
    monkeypatch.setattr(sp, "pick_wcap", lambda *a: 8)
    orig_dispatch = sp.PendingDemux._dispatch

    def spying(self, cap, wcap):
        grown.append((cap, wcap))
        return orig_dispatch(self, cap, wcap)

    monkeypatch.setattr(sp.PendingDemux, "_dispatch", spying)
    dd = decode_streams_segmented([flac])
    assert getattr(dd, "segmented", False)
    got = dd.to_host()
    assert np.array_equal(want[0].pcm, got[0].pcm)
    assert grown[0] == (8, 8) and len(grown) >= 2
    assert grown[-1][0] > 8 and grown[-1][1] > 8
