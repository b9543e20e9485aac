"""Randomized encoder-parameter sweep: every combination must decode
bit-exactly (STREAMINFO MD5) through the scalar, native, and device paths.
N defaults small for CI speed; CLAXON_TPU_SWEEP=200 widens it."""

import os

import numpy as np
import pytest

from claxon_tpu import FlacReader, native
from claxon_tpu.pipeline import decode_stream
from claxon_tpu.testing import encode_flac, synth_music
from util import decode_all_blocks, interleave, pcm_md5

N = int(os.environ.get("CLAXON_TPU_SWEEP", "12"))
SEED_BASE = int(os.environ.get("CLAXON_TPU_SWEEP_SEED", "123400"))


def random_case(rng):
    bps = int(rng.choice([8, 12, 16, 20, 24]))
    channels = int(rng.choice([1, 2, 2, 2, 3, 6]))
    n = int(rng.integers(500, 12000))
    kw = dict(
        block_size=int(rng.choice([192, 576, 1000, 1024, 4096])),
        stereo=str(rng.choice(["auto", "independent", "left_side",
                               "right_side"])) if channels == 2 else "auto",
        max_lpc_order=int(rng.choice([2, 8, 12, 32])),
        partition_order=int(rng.choice([0, 2, 4])),
        rice2=bool(rng.integers(0, 2)),
        variable_blocking=bool(rng.integers(0, 2)),
        lpc_precision=int(rng.choice([10, 14, 15])),
    )
    force = rng.choice([None, None, None, "verbatim", "fixed"])
    if force is not None:
        kw["force_subframe"] = str(force)
    pcm = synth_music(n, channels=channels, bps=bps,
                      seed=int(rng.integers(0, 1 << 30)))
    if rng.integers(0, 4) == 0:
        pcm = np.asarray(pcm) & ~np.int64((1 << int(rng.integers(1, 5))) - 1)
    return encode_flac(pcm, 44100, bps, **kw), bps


@pytest.mark.parametrize("case", range(N))
def test_sweep_all_paths_md5(case):
    rng = np.random.default_rng(SEED_BASE + case)
    data, bps = random_case(rng)

    reader = FlacReader(data)
    si = reader.streaminfo()
    scalar = interleave(decode_all_blocks(reader))
    assert pcm_md5(scalar, si.bits_per_sample) == si.md5sum, "scalar"

    dec = decode_stream(data, use_native=False)
    assert np.array_equal(dec.pcm, scalar), "python pipeline"

    if native.available():
        dec = decode_stream(data, use_native=True)
        assert np.array_equal(dec.pcm, scalar), "native pipeline"
        _si, pcm = native.decode_stream_scalar(data)
        assert np.array_equal(pcm, scalar), "native scalar"


@pytest.mark.slow
def test_sweep_segmented_path():
    """Randomized configs through decode_streams_segmented (VERDICT r4
    item 6: the newest path gets the same breadth treatment). Odd
    streams -- > 2 channels, > 64 partitions, variable blocking quirks
    -- must take the per-stream fallback and every stream must stay
    bit-exact vs the scalar oracle. tools/verify_samples.py --segmented
    runs the same check at corpus scale."""
    if not native.available():
        pytest.skip("native core unavailable")
    from claxon_tpu.pipeline_seg import decode_streams_segmented

    rng = np.random.default_rng(SEED_BASE + 777)
    datas, wants = [], []
    for _ in range(max(N // 2, 6)):
        data, _bps = random_case(rng)
        datas.append(data)
        _si, pcm = native.decode_stream_scalar(data)
        wants.append(pcm)
    dd = decode_streams_segmented(datas)
    res = dd.to_host()
    assert getattr(dd, "segmented", False), \
        "device demux engaged for no stream"
    for dec, want in zip(res, wants):
        assert np.array_equal(dec.pcm, want)
