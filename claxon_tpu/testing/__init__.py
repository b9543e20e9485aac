"""Test/bench utilities. Not part of the decoder API surface.

The centerpiece is ``flacgen``, a spec-derived FLAC *encoder* used to
generate corpora with known PCM (and a genuine STREAMINFO MD5) for
differential testing and benchmarking. The reference project tests against
the installed ``flac``/``metaflac`` binaries; this environment has none, so
the encoder plus the stored-MD5 oracle of the committed corpus fill that
role.
"""

from .flacgen import encode_flac, synth_music
from .containers_gen import split_flac, mux_ogg_flac, mux_mp4_flac


def pcm_md5(samples_interleaved, bits_per_sample):
    """MD5 of the unencoded audio data, as stored in STREAMINFO: samples
    interleaved, little-endian, ceil(bps/8) bytes each (reference
    `src/lib.rs` STREAMINFO semantics). The single canonical helper --
    the oracle packing must never diverge between tests, bench, and the
    corpus verifier."""
    import hashlib

    import numpy as np

    nbytes = (bits_per_sample + 7) // 8
    raw = np.ascontiguousarray(samples_interleaved, dtype="<i4").tobytes()
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 4)[:, :nbytes]
    return hashlib.md5(arr.tobytes()).digest()


__all__ = ["encode_flac", "synth_music", "split_flac", "mux_ogg_flac",
           "mux_mp4_flac", "pcm_md5"]
