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

__all__ = ["encode_flac", "synth_music", "split_flac", "mux_ogg_flac",
           "mux_mp4_flac"]
