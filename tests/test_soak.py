"""Long-stream soak: a >=10-minute stream through the device pipeline.

The reference is exercised on real multi-minute recordings (p0-p4,
/root/reference/testsamples/populate.sh:3-29); this environment has no
network, so the soak decodes a generated 10-minute stream instead --
thousands of frames, multiple device buckets, multiple d2h fetch cycles
-- and checks bit-exactness against the PRE-encode PCM (the MD5 is also
computed before encoding, so an encoder bug cannot self-confirm).

The stream is synthesized at 8 kHz so ten minutes of audio stays cheap
enough for the one-core CPU suite; bucket shapes, fetch chunking, and
batch boundaries depend on sample COUNT, not sample rate, so the decode
exercises the same code paths as 10 minutes of 44.1 kHz would at 1/5.5
the test time.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from claxon_tpu import FlacReader
from claxon_tpu.testing import encode_flac, pcm_md5, synth_music

pytestmark = pytest.mark.slow

RATE = 8000
N = 10 * 60 * RATE  # 4.8M inter-channel samples = 10 minutes


@pytest.fixture(scope="module")
def long_stream():
    pcm = synth_music(N, channels=2, bps=16, seed=11, sample_rate=RATE)
    flac = encode_flac(pcm, RATE, 16, block_size=4096)
    return pcm, flac


def test_long_stream_device_decode_bit_exact(long_stream):
    from claxon_tpu.pipeline import decode_streams_device

    pcm, flac = long_stream
    dec = decode_streams_device([flac])
    dec.verify_crc()
    out = dec.to_host()[0]
    assert out.pcm.shape == pcm.shape
    assert np.array_equal(out.pcm, pcm)
    # The STREAMINFO MD5 (computed pre-encode) agrees with the decode.
    si = FlacReader(flac).streaminfo()
    assert si.md5sum == pcm_md5(out.pcm, 16)
    assert len(out.frame_sizes) == -(-N // 4096)


def test_long_stream_multi_bucket_and_fetch(long_stream):
    """The soak must actually exercise batch/fetch plumbing: >1000 frames,
    more lane-rows than one bucket dispatch, multiple fetch chunks."""
    from claxon_tpu.pipeline import _FETCH_CHUNKS, bucket_shape

    pcm, flac = long_stream
    n_frames = -(-N // 4096)
    assert n_frames >= 1000
    L, T = bucket_shape(n_frames * 2, 4096)
    assert L >= 1024  # thousands of lanes in flight
    assert n_frames * 2 > _FETCH_CHUNKS  # multiple async fetch chunks
