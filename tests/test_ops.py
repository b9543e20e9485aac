"""Device-kernel unit tests: the int64-emulation arithmetic fuzzed against
Python bignums, and the unified synthesis kernel against the reference's
real-stream golden vectors and a scalar oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from claxon_tpu.ops.i64 import bucket_dot, combine_buckets, sar_low32, dot_sar
from claxon_tpu.ops.predict import (synthesize, synthesize_reference,
                                    pack_coefficients, ORDER_MAX)
from claxon_tpu.ops.epilogue import (apply_epilogue, pack_int16_pairs,
                                     unpack_int16_pairs)


def wrap32(x):
    x = int(x) & 0xFFFFFFFF
    return x - (1 << 32) if x >= (1 << 31) else x


def test_bucket_dot_exact_random():
    rng = np.random.default_rng(0)
    L, K = 64, ORDER_MAX
    c = rng.integers(-(1 << 14), 1 << 14, (L, K)).astype(np.int32)
    s = rng.integers(-(1 << 31), 1 << 31, (L, K)).astype(np.int64).astype(np.int32)
    hi, lo = combine_buckets(*bucket_dot(jnp.asarray(c), jnp.asarray(s), axis=1))
    hi, lo = np.asarray(hi), np.asarray(lo)
    for l in range(L):
        exact = int(np.dot(c[l].astype(object), s[l].astype(object)))
        got = (int(hi[l]) << 32) | (int(lo[l]) & 0xFFFFFFFF)
        got = got - (1 << 64) if got >= (1 << 63) else got
        assert got == exact, (l, got, exact)


def test_dot_sar_matches_bignum():
    rng = np.random.default_rng(1)
    L, K = 128, ORDER_MAX
    c = rng.integers(-(1 << 14), 1 << 14, (L, K)).astype(np.int32)
    s = rng.integers(-(1 << 31), 1 << 31, (L, K)).astype(np.int64).astype(np.int32)
    shift = rng.integers(0, 16, L).astype(np.int32)
    got = np.asarray(dot_sar(jnp.asarray(c), jnp.asarray(s), jnp.asarray(shift), axis=1))
    for l in range(L):
        exact = int(np.dot(c[l].astype(object), s[l].astype(object))) >> int(shift[l])
        assert int(got[l]) == wrap32(exact), l


def test_sar_low32_edges():
    cases = [
        (0, 5, 0), (0, 5, 1), (-1, -1, 4), (-1, -8, 3),
        (123456, -1, 15), (-123456, 0, 7), (0, -1, 0),
    ]
    his = jnp.asarray([c[0] for c in cases], dtype=jnp.int32)
    los = jnp.asarray([c[1] for c in cases], dtype=jnp.int32)
    ss = jnp.asarray([c[2] for c in cases], dtype=jnp.int32)
    got = np.asarray(sar_low32(his, los, ss))
    for i, (h, l, s) in enumerate(cases):
        v = (int(h) << 32) | (int(l) & 0xFFFFFFFF)
        assert int(got[i]) == wrap32(v >> s), (i, cases[i])


def _synth_one(x, coefs, shift, order, T=None):
    """Run the batched kernel on a single lane."""
    T = len(x)
    xs = jnp.asarray(np.asarray(x, dtype=np.int32)[None, :])
    cs = jnp.asarray(pack_coefficients([coefs]))
    out = synthesize(xs, cs, jnp.asarray([shift], dtype=jnp.int32),
                     jnp.asarray([order], dtype=jnp.int32))
    return np.asarray(out)[0].tolist()


def test_synthesize_lpc_realstream():
    # Golden vectors from the reference (`src/subframe.rs:616-649`): the
    # buffer holds warm-up samples then residuals.
    coefs = [-75, 166, 121, -269, -75, -399, 1042]
    x = [-796, -547, -285, -32, 199, 443, 670, -2,
         -23, 14, 6, 3, -4, 12, -2, 10]
    out = _synth_one(x, coefs, 9, len(coefs))
    assert out == [-796, -547, -285, -32, 199, 443, 670, 875,
                   1046, 1208, 1343, 1454, 1541, 1616, 1663, 1701]


def test_synthesize_lpc_overflow_case():
    coefs = [119, -255, 555, -836, 879, -1199, 1757]
    x = [-21363, -21951, -22649, -24364, -27297, -26870, -30017, 3157]
    out = _synth_one(x, coefs, 10, len(coefs))
    assert out == [-21363, -21951, -22649, -24364, -27297, -26870, -30017, -29718]


def test_synthesize_lpc_high_order():
    coefs = [709, -2589, 4600, -4612, 1350, 4220, -9743, 12671, -12129, 8586,
             -3775, -645, 3904, -5543, 4373, 182, -6873, 13265, -15417, 11550]
    x = [213238, 210830, 234493, 209515, 235139, 201836, 208151, 186277,
         157720, 148176, 115037, 104836, 60794, 54523, 412, 17943, -6025,
         -3713, 8373, 11764, 30094]
    out = _synth_one(x, coefs, 12, len(coefs))
    assert out[-1] == 33931


def test_synthesize_fixed_as_lpc():
    # FIXED order 3 == LPC with Pascal coefficients and shift 0; golden
    # vector from the reference (`src/subframe.rs:476-490`).
    x = [-729, -722, -667, -19, -16, 17, -23, -7,
         16, -16, -5, 3, -8, -13, -15, -1]
    out = _synth_one(x, [1, -3, 3], 0, 3)
    assert out == [-729, -722, -667, -583, -486, -359, -225, -91,
                   59, 209, 354, 497, 630, 740, 812, 845]


def test_synthesize_fixed_wrapping():
    x = [21877, 27482, -6513]
    out = _synth_one(x, [-1, 2], 0, 2)
    assert out == [21877, 27482, 26574]


def test_synthesize_order0_passthrough():
    x = [5, -3, 100, -(1 << 30)]
    out = _synth_one(x, [], 0, 0)
    assert out == x


def test_synthesize_batch_matches_oracle():
    rng = np.random.default_rng(7)
    L, T = 16, 64
    x = rng.integers(-(1 << 15), 1 << 15, (L, T)).astype(np.int32)
    orders = rng.integers(0, ORDER_MAX + 1, L).astype(np.int32)
    shifts = rng.integers(0, 16, L).astype(np.int32)
    coefs = np.zeros((L, ORDER_MAX), dtype=np.int32)
    for l in range(L):
        o = orders[l]
        if o:
            coefs[l, ORDER_MAX - o:] = rng.integers(-(1 << 14), 1 << 14, o)
    got = np.asarray(synthesize(jnp.asarray(x), jnp.asarray(coefs),
                                jnp.asarray(shifts), jnp.asarray(orders)))
    want = synthesize_reference(x, coefs, shifts, orders)
    assert np.array_equal(got, want)


def test_epilogue_wasted_and_stereo():
    # Pairs: 0 mid/side, 1 left/side, 2 right/side, 3 independent with
    # wasted bits on the first lane.
    samples = np.array([
        [-2, -14, 12, -6],     # mid
        [7, 38, 142, 238],     # side
        [2, 5, 83, 113],       # left
        [7, 38, 142, 238],     # side
        [7, 38, 142, 238],     # side
        [-5, -33, -59, -125],  # right
        [1, -2, 3, -4],        # independent, wasted=4
        [0, 0, 0, 0],          # padding lane
    ], dtype=np.int32)
    wasted = np.array([0, 0, 0, 0, 0, 0, 4, 0], dtype=np.int32)
    pair_modes = np.array([3, 1, 2, 0], dtype=np.int32)
    out = np.asarray(apply_epilogue(jnp.asarray(samples), jnp.asarray(wasted),
                                    jnp.asarray(pair_modes)))
    # Golden triples from the reference frame tests (`src/frame.rs:336-399`).
    assert out[0].tolist() == [2, 5, 83, 113]       # left from mid/side
    assert out[1].tolist() == [-5, -33, -59, -125]  # right from mid/side
    assert out[2].tolist() == [2, 5, 83, 113]       # left unchanged
    assert out[3].tolist() == [-5, -33, -59, -125]  # right = left - side
    assert out[4].tolist() == [2, 5, 83, 113]       # left = side + right
    assert out[5].tolist() == [-5, -33, -59, -125]  # right unchanged
    assert out[6].tolist() == [16, -32, 48, -64]    # wasted-bits shift
    assert out[7].tolist() == [0, 0, 0, 0]          # padding passthrough


def test_pack_int16_pairs_roundtrip_and_flag():
    rng = np.random.default_rng(5)
    x = rng.integers(-32768, 32768, (4, 64)).astype(np.int32)
    packed, flag = pack_int16_pairs(jnp.asarray(x))
    assert int(flag) == 0
    # Little-endian host reinterpret recovers the exact int16 samples.
    assert np.array_equal(np.asarray(packed).view(np.int16), x)
    # Device-side unpack inverts the host-side input packing too.
    assert np.array_equal(np.asarray(unpack_int16_pairs(packed)), x)

    x[2, 7] = 40000  # exceeds int16 -> flag fires
    _, flag = pack_int16_pairs(jnp.asarray(x))
    assert int(flag) == 1
    x[2, 7] = -33000
    _, flag = pack_int16_pairs(jnp.asarray(x))
    assert int(flag) == 1


def test_device_decode_api():
    from claxon_tpu.pipeline import decode_streams_device, decode_streams
    from claxon_tpu.testing import encode_flac, synth_music

    datas = [encode_flac(synth_music(5000, channels=2, bps=16, seed=s),
                         44100, 16, block_size=1024) for s in (1, 2)]
    dev = decode_streams_device(datas).block_until_ready()
    buckets = dev.device_buckets()
    assert buckets and all(b[2].dtype.name == "int32" for b in buckets)
    host = dev.to_host()
    direct = decode_streams(datas)
    assert len(host) == len(direct) == len(datas)
    for a, b in zip(host, direct):
        assert np.array_equal(a.pcm, b.pcm)


def test_pallas_synthesize_matches_xla():
    from claxon_tpu.ops.pallas_synth import synthesize_pallas

    rng = np.random.default_rng(17)
    L, T = 160, 300  # unaligned lane count and time length
    x = rng.integers(-(1 << 15), 1 << 15, (L, T)).astype(np.int32)
    orders = rng.integers(0, ORDER_MAX + 1, L).astype(np.int32)
    shifts = np.where(orders > 0, rng.integers(0, 16, L), 0).astype(np.int32)
    coefs = np.zeros((L, ORDER_MAX), dtype=np.int32)
    for l in range(L):
        o = orders[l]
        if o:
            coefs[l, ORDER_MAX - o:] = rng.integers(-(1 << 14), 1 << 14, o)
    a = np.asarray(synthesize(jnp.asarray(x), jnp.asarray(coefs),
                              jnp.asarray(shifts), jnp.asarray(orders)))
    b = np.asarray(synthesize_pallas(jnp.asarray(x), jnp.asarray(coefs),
                                     jnp.asarray(shifts),
                                     jnp.asarray(orders), chunk=64))
    assert np.array_equal(a, b)


def test_pallas_synthesize_golden():
    from claxon_tpu.ops.pallas_synth import synthesize_pallas

    coefs = [-75, 166, 121, -269, -75, -399, 1042]
    x = [-796, -547, -285, -32, 199, 443, 670, -2,
         -23, 14, 6, 3, -4, 12, -2, 10]
    xs = jnp.asarray(np.asarray(x, dtype=np.int32)[None, :])
    cs = jnp.asarray(pack_coefficients([coefs]))
    out = synthesize_pallas(xs, cs, jnp.asarray([9], dtype=jnp.int32),
                            jnp.asarray([len(coefs)], dtype=jnp.int32))
    assert np.asarray(out)[0].tolist() == \
        [-796, -547, -285, -32, 199, 443, 670, 875,
         1046, 1208, 1343, 1454, 1541, 1616, 1663, 1701]


def test_rice_decode_device_matches_host():
    """Device Rice decoder vs a straightforward host decode, over random
    partitions sharing one packed bit buffer: varying params (incl. 0 and
    large), long zero runs, word straddles, and u32 quotient wrap."""
    from claxon_tpu.ops.rice import rice_decode, pack_bits_be
    from claxon_tpu.testing.flacgen import BitWriter

    rng = np.random.default_rng(77)
    w = BitWriter()
    start_bits, params, counts, expected = [], [], [], []
    bitpos = 0

    def emit(q, k, r):
        nonlocal bitpos
        w.write_unary(q)
        w.write(r, k)
        bitpos += q + 1 + k
        v = ((q << k) | r) & 0xFFFFFFFF
        return -1 - (v >> 1) if v & 1 else v >> 1

    for lane in range(24):
        k = int(rng.choice([0, 1, 4, 8, 14, 30]))
        n = int(rng.integers(1, 40))
        start_bits.append(bitpos)
        params.append(k)
        counts.append(n)
        vals = []
        for _ in range(n):
            q = int(rng.choice([0, 1, 2, 7, 40, 200]))
            r = int(rng.integers(0, 1 << k)) if k else 0
            vals.append(emit(q, k, r))
        expected.append(vals)
    w.align()

    words = pack_bits_be(w.getvalue())
    out, end = rice_decode(words, start_bits, params, counts)
    out = np.asarray(out)
    end = np.asarray(end)
    for lane, vals in enumerate(expected):
        got = out[lane, :counts[lane]].tolist()
        assert got == vals, (lane, params[lane], got[:5], vals[:5])
        assert np.all(out[lane, counts[lane]:] == 0)
        nxt = start_bits[lane + 1] if lane + 1 < len(start_bits) else None
        if nxt is not None:
            assert int(end[lane]) == nxt  # cursor lands on the next lane
