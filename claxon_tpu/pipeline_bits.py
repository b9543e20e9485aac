"""Bits-path device pipeline: residual bits in, PCM out.

The production flagship path (round-2 upgrade over ``pipeline.py``'s
sample-shipping path): the C++ boundary scan (``native.extract_stream_bits``)
never materializes residual values -- it ships the compressed bits plus
per-sample bit-gap bytes, and the TPU performs the entropy decode
(``ops.entropy``), prediction synthesis, wasted-bits/stereo epilogue and
int16 transfer packing in ONE fused XLA program per bucket.

Compared to the sample path this cuts the host's per-sample work to the
bit-boundary walk (no remainder extraction, no zig-zag, no 4-byte stores)
and the uplink to ~2 bytes/sample (slots + deltas) while keeping every
output bit-exact (claxon `src/subframe.rs:309-351` semantics on device).

Frames the kernel cannot represent (> 64 partitions, codes over 255 bits,
an empty first partition) were decoded host-side by the walker (frame
flags bit 0) and ride the legacy sample-shipping program; both kinds of
bucket land in one ``DeviceDecoded``.
"""

from functools import lru_cache

import numpy as np

from .ops.entropy import decode_residual_bits
from .ops.epilogue import apply_epilogue, pack_int16_pairs

__all__ = ["decode_raw_bits_device"]

# Partition-count classes: the one-hot k expansion compiles per class, so
# quantizing the bucket maximum keeps the number of programs small.
_P_CLASSES = (1, 2, 4, 8, 16, 32, 64)


def _p_class(n):
    for p in _P_CLASSES:
        if n <= p:
            return p
    return _P_CLASSES[-1]


def _jnp():
    import jax.numpy as jnp
    return jnp


@lru_cache(maxsize=None)
def _bits_program(n_parts_max, sa, out_packed, chunked=True):
    """The fused bits-bucket program: entropy decode -> synthesis ->
    epilogue -> transfer packing, compiled once per (shape, P, packing).
    ``slots`` crosses the link flat (L, NC*sa) -- see decode_residual_bits
    on why a minor dimension of sa would inflate the transfer."""
    import jax

    from .ops.predict import synthesize_best
    from .pipeline import _split_lanes, _FETCH_CHUNKS

    @jax.jit
    def prog(slots, deltas, ks, meta):
        # One coalesced int32 metadata array per bucket: every per-lane
        # scalar/vector rides a single transfer (each h2d on the tunneled
        # backend pays a round trip, so 13 arrays/bucket was ~3x slower to
        # dispatch than 4). Layout matches _META_COLS.
        L = meta.shape[0]
        orders, shifts, wasted, ps, pbits, vflags, lengths = (
            meta[:, i] for i in range(7))
        pair_modes = meta[:L // 2, 7]
        warm = meta[:, 8:40]
        coefs = meta[:, 40:72]
        x = decode_residual_bits(slots, deltas, ks, ps, orders, pbits,
                                 vflags, warm, n_parts_max=n_parts_max,
                                 sa=sa)
        out = synthesize_best(x, coefs, shifts, orders, lengths)
        out = apply_epilogue(out, wasted, pair_modes)
        if not chunked:
            return out
        if out_packed:
            packed, flag = pack_int16_pairs(out)
            return out, flag, _split_lanes(packed, _FETCH_CHUNKS)
        return out, _split_lanes(out, _FETCH_CHUNKS)

    return prog


#: meta columns: 0 order, 1 shift, 2 wasted, 3 ps, 4 pbits, 5 vflags,
#: 6 length, 7 pair_mode (rows [0, L//2)), 8:40 warm-up, 40:72 coefs.
_META_W = 72


def _runs(recs):
    """Group bucket records into contiguous-lane runs: consecutive frames
    of one stream with one block size have contiguous spans in every flat
    array, so each run is a handful of bulk numpy copies."""
    i = 0
    while i < len(recs):
        j = i
        while (j + 1 < len(recs)
               and recs[j + 1]["si"] == recs[j]["si"]
               and recs[j + 1]["bs"] == recs[j]["bs"]
               and recs[j + 1]["lane"] == recs[j]["lane"] + recs[j]["nch"]):
            j += 1
        yield recs[i:j + 1]
        i = j + 1


def decode_raw_bits_device(braws, lane_quantum=None):
    """Decode [(streaminfo, BitsBatch), ...] into a DeviceDecoded.

    Semantically identical to the sample path (``decode_streams_device``
    with the legacy extractor); bit-exactness is enforced by the shared
    MD5/differential test suite.
    """
    from .error import fmt_err
    from .pipeline import (DecodedStream, DeviceDecoded, _BucketDispatch,
                           _decode_program, _pack_input_i16, _t_bucket_of,
                           bucket_shape, _L_QUANTUM, _LITTLE_ENDIAN)
    from .ops.predict import ORDER_MAX

    if lane_quantum is None:
        lane_quantum = _L_QUANTUM
    jnp = _jnp()

    results, pcms = [], []
    bit_groups, smp_groups = {}, {}
    for si_idx, (si, bb) in enumerate(braws):
        bf = bb.bframes
        if np.any(bf["channels"] != si.channels):
            fmt_err("frame channel count does not match streaminfo")
        bs_v = bf["block_size"].astype(np.int64)
        nch_v = bf["channels"].astype(np.int64)
        nc_v = (bs_v + 31) // 32
        sa_v = bf["s_class"].astype(np.int64) + 1
        fb_v = (bf["flags"] & 1) != 0
        out0_v = np.concatenate([[0], np.cumsum(bs_v)[:-1]])
        lane0_v = np.concatenate([[0], np.cumsum(nch_v)[:-1]])

        # Per-lane flat-buffer offsets (fallback lanes consume samples,
        # bits lanes consume deltas/slots; every lane consumes ks).
        lane_fb = np.repeat(fb_v, nch_v)
        lane_bs = np.repeat(bs_v, nch_v)
        lane_slot = np.repeat(nc_v * sa_v, nch_v)
        d_sz = np.where(lane_fb, 0, lane_bs)
        s_sz = np.where(lane_fb, 0, lane_slot)
        x_sz = np.where(lane_fb, lane_bs, 0)
        k_sz = bb.bsubs["n_parts"].astype(np.int64)
        d_off = np.concatenate([[0], np.cumsum(d_sz)[:-1]])
        s_off = np.concatenate([[0], np.cumsum(s_sz)[:-1]])
        x_off = np.concatenate([[0], np.cumsum(x_sz)[:-1]])
        k_off = np.concatenate([[0], np.cumsum(k_sz)[:-1]])

        total = int(bs_v.sum())
        pcm = np.zeros((total, si.channels), dtype=np.int32)
        pcms.append(pcm)
        results.append(DecodedStream(
            streaminfo=si, pcm=pcm,
            frame_times=bf["time"].tolist(),
            frame_sizes=bf["block_size"].tolist()))

        for i in range(len(bf)):
            lane = int(lane0_v[i])
            rec = {"si": si_idx, "bb": bb, "bs": int(bs_v[i]),
                   "nch": int(nch_v[i]), "mode": int(bf["mode"][i]),
                   "bps": int(bf["bps"][i]), "lane": lane,
                   "out0": int(out0_v[i]), "nc": int(nc_v[i]),
                   "sa": int(sa_v[i]), "d0": int(d_off[lane]),
                   "s0": int(s_off[lane]), "x0": int(x_off[lane]),
                   "k0": int(k_off[lane])}
            t_bucket = _t_bucket_of(rec["bs"])
            if fb_v[i]:
                smp_groups.setdefault((t_bucket, rec["nch"]),
                                      []).append(rec)
            else:
                bit_groups.setdefault((t_bucket, rec["nch"], rec["sa"]),
                                      []).append(rec)

    dispatches, plans = [], []

    for (t_bucket, n_ch, SA), recs in bit_groups.items():
        n_lanes = sum(r["nch"] for r in recs)
        L, T = bucket_shape(n_lanes, t_bucket, lane_quantum)
        NC = (T + 31) // 32
        T_ext = NC * 32
        P = _p_class(max(
            int(r["bb"].bsubs["n_parts"][r["lane"] + c])
            for r in recs for c in range(r["nch"])))

        # The slot buffer is deliberately NOT zeroed: the kernel reads only
        # word indices inside each lane's copied chunks, and padding lanes'
        # outputs are forced to zero by their all-zero deltas, so leftover
        # heap content never reaches any decoded sample.
        slots = np.empty((L, NC * SA), dtype=np.int32)
        slots3 = slots.reshape(L, NC, SA)  # host-side fill view
        deltas = np.zeros((L, T_ext), dtype=np.uint8)
        ks = np.zeros((L, P), dtype=np.int32)
        meta = np.zeros((L, _META_W), dtype=np.int32)

        lane = 0
        plan = []
        out_packed = _LITTLE_ENDIAN and T_ext % 2 == 0
        for run in _runs(recs):
            bb = run[0]["bb"]
            nl = len(run) * n_ch
            bs, nc = run[0]["bs"], run[0]["nc"]
            sub0 = run[0]["lane"]
            plan.append((run[0]["si"], run[0]["out0"], len(run), bs, n_ch,
                         lane))
            deltas[lane:lane + nl, :bs] = \
                bb.deltas[run[0]["d0"]:run[0]["d0"] + nl * bs].reshape(
                    nl, bs)
            slots3[lane:lane + nl, :nc, :] = \
                bb.slots[run[0]["s0"]:run[0]["s0"] + nl * nc * SA].reshape(
                    nl, nc, SA)
            subs = bb.bsubs[sub0:sub0 + nl]
            m = meta[lane:lane + nl]
            m[:, 0] = subs["order"]
            m[:, 1] = subs["shift"]
            m[:, 2] = subs["wasted"]
            m[:, 3] = subs["ps"]
            m[:, 4] = subs["pbits"]
            m[:, 5] = subs["flags"] & 1
            m[:, 6] = bs
            m[:, 8:40] = subs["warm"]
            m[:, 40:72] = subs["coefs"]
            ko = run[0]["k0"]
            for j in range(nl):
                nparts = int(subs["n_parts"][j])
                ks[lane + j, :nparts] = bb.ks[ko:ko + nparts]
                ko += nparts
            if n_ch == 2:
                meta[lane // 2:lane // 2 + len(run), 7] = \
                    [r["mode"] for r in run]
            out_packed = out_packed and all(r["bps"] <= 16 for r in run)
            lane += nl

        prog = _bits_program(P, SA, out_packed)
        args = (jnp.asarray(slots), jnp.asarray(deltas), jnp.asarray(ks),
                jnp.asarray(meta))
        if out_packed:
            out, flag, chunks = prog(*args)
            dispatches.append(_BucketDispatch([], n_ch, out, chunks, True,
                                              flag))
        else:
            out, chunks = prog(*args)
            dispatches.append(_BucketDispatch([], n_ch, out, chunks, False))
        plans.append(plan)

    # Fallback frames: the legacy sample-shipping program (x rows come from
    # the walker's host-decoded samples buffer).
    for (t_bucket, n_ch), recs in smp_groups.items():
        n_lanes = sum(r["nch"] for r in recs)
        L, T = bucket_shape(n_lanes, t_bucket, lane_quantum)
        x = np.zeros((L, T), dtype=np.int32)
        coefs = np.zeros((L, ORDER_MAX), dtype=np.int32)
        shifts = np.zeros(L, dtype=np.int32)
        orders = np.zeros(L, dtype=np.int32)
        wasted = np.zeros(L, dtype=np.int32)
        pair_modes = np.zeros(L // 2, dtype=np.int32)
        lengths = np.zeros(L, dtype=np.int32)

        lane = 0
        plan = []
        for run in _runs(recs):
            bb = run[0]["bb"]
            nl = len(run) * n_ch
            bs = run[0]["bs"]
            sub0 = run[0]["lane"]
            plan.append((run[0]["si"], run[0]["out0"], len(run), bs, n_ch,
                         lane))
            x[lane:lane + nl, :bs] = \
                bb.samples[run[0]["x0"]:run[0]["x0"] + nl * bs].reshape(
                    nl, bs)
            subs = bb.bsubs[sub0:sub0 + nl]
            orders[lane:lane + nl] = subs["order"]
            shifts[lane:lane + nl] = subs["shift"]
            wasted[lane:lane + nl] = subs["wasted"]
            coefs[lane:lane + nl] = subs["coefs"]
            lengths[lane:lane + nl] = bs
            if n_ch == 2:
                pair_modes[lane // 2:lane // 2 + len(run)] = \
                    [r["mode"] for r in run]
            lane += nl

        in_packed = (_LITTLE_ENDIAN and T % 2 == 0 and
                     x.min(initial=0) >= -32768 and x.max(initial=0) <= 32767)
        if in_packed:
            x = _pack_input_i16(x)
        out_packed = (_LITTLE_ENDIAN and T % 2 == 0 and
                      all(r["bps"] <= 16 for r in recs))
        prog = _decode_program(in_packed, out_packed)
        args = (jnp.asarray(x), jnp.asarray(coefs), jnp.asarray(shifts),
                jnp.asarray(orders), jnp.asarray(wasted),
                jnp.asarray(pair_modes), jnp.asarray(lengths))
        if out_packed:
            out, flag, chunks = prog(*args)
            dispatches.append(_BucketDispatch([], n_ch, out, chunks, True,
                                              flag))
        else:
            out, chunks = prog(*args)
            dispatches.append(_BucketDispatch([], n_ch, out, chunks, False))
        plans.append(plan)

    dd = DeviceDecoded(results, [], [], dispatches)
    dd._raw_plans = (plans, pcms)
    return dd
