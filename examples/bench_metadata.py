#!/usr/bin/env python
"""Benchmark metadata-only reads over a directory of FLAC files.

Counterpart of the reference's `examples/bench_metadata.rs:19-82`: open up
to 1024 files in metadata-only mode, read 16 common tags from each, repeat
10 times, report p10/p50/p90/mean microseconds per file and MiB/s over the
bytes actually read.

Usage: python examples/bench_metadata.py DIR
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from claxon_tpu import FlacReader, FlacReaderOptions

TAGS = ["album", "albumartist", "albumartistsort", "albumsort", "artist",
        "artistsort", "date", "discnumber", "disctotal", "musicbrainz_albumid",
        "musicbrainz_trackid", "originaldate", "title", "titlesort",
        "tracknumber", "tracktotal"]


def read_metadata(fname):
    reader = FlacReader.open_ext(
        fname, FlacReaderOptions(metadata_only=True,
                                 read_vorbis_comment=True))
    n = 0
    for tag in TAGS:
        for _value in reader.get_tag(tag):
            n += 1
    return n


def main(argv):
    if len(argv) != 1:
        print(__doc__)
        return 1
    files = sorted(pathlib.Path(argv[0]).rglob("*.flac"))[:1024]
    if not files:
        print("no .flac files found")
        return 1

    timings = []
    for _round in range(10):
        for f in files:
            t0 = time.perf_counter_ns()
            read_metadata(f)
            timings.append((time.perf_counter_ns() - t0) / 1e3)
    total_bytes = sum(f.stat().st_size for f in files)

    t = np.array(timings)
    p10, p50, p90 = np.percentile(t, [10, 50, 90])
    print(f"files: {len(files)}  reads: {len(t)}")
    print(f"p10 {p10:9.1f}  p50 {p50:9.1f}  p90 {p90:9.1f}  "
          f"mean {t.mean():9.1f} us/file")
    seconds_per_round = t.sum() / 1e6 / 10
    mib_s = total_bytes / 2**20 / seconds_per_round
    print(f"{mib_s:9.1f} MiB/s over the files' bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
