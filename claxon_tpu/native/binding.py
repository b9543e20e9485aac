"""ctypes binding to the C++ demux core (placeholder until built).

The C++ library is compiled by ``python -m claxon_tpu.native.build``; until
then ``available()`` returns False and the framework uses the Python
extractor.
"""

__all__ = ["available", "extract_stream", "decode_stream_scalar"]


def available():
    return False


def extract_stream(data):
    raise NotImplementedError("native demux core not built")


def decode_stream_scalar(data):
    raise NotImplementedError("native demux core not built")
