#!/usr/bin/env python
"""Print the Vorbis comments (tags) of FLAC files, `metaflac --list` style.

Counterpart of the reference's `examples/tags.rs:1-28`.

Usage: python examples/tags.py FILE [FILE ...]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from claxon_tpu import FlacReader, FlacReaderOptions


def main(argv):
    if not argv:
        print(__doc__)
        return 1
    for fname in argv:
        # Metadata-only mode: stops reading at the end of the metadata,
        # never touching the audio stream (reference `src/lib.rs:122-151`).
        reader = FlacReader.open_ext(
            fname, FlacReaderOptions(metadata_only=True,
                                     read_vorbis_comment=True))
        print(f"{fname}:")
        for name, value in reader.tags():
            print(f"  {name} = {value}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
