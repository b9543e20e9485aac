"""Shared test helpers."""


import numpy as np


def decode_all_blocks(reader):
    """Decode every block through the scalar host path; returns a list of
    per-block (time, numpy int32 array of shape (channels, block_size))."""
    fr = reader.blocks()
    out = []
    buf = None
    while True:
        blk = fr.read_next_or_eof(buf)
        if blk is None:
            break
        bs, nch = blk.duration(), blk.channels()
        arr = np.empty((nch, bs), dtype=np.int32)
        for ch in range(nch):
            arr[ch] = blk.channel(ch)
        out.append((blk.time(), arr))
        buf = blk.into_buffer()
    return out


def interleave(blocks):
    """Concatenate blocks into one interleaved (n, channels) int32 array."""
    if not blocks:
        return np.zeros((0, 1), dtype=np.int32)
    return np.concatenate([arr.T for _, arr in blocks], axis=0)


from claxon_tpu.testing import pcm_md5  # noqa: F401 -- canonical helper


def verify_md5(reader_blocks, streaminfo):
    inter = interleave(reader_blocks)
    return pcm_md5(inter, streaminfo.bits_per_sample) == streaminfo.md5sum
