#!/usr/bin/env python
"""STB preprocessing CLI (reference tool/create_STB_DB.py:436-455).

    python scripts/create_stb_db.py SRC DST SIZE
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmhand_tpu.data.preprocess import create_stb_db  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("src")
    parser.add_argument("dst")
    parser.add_argument("size", type=int, nargs="?", default=256)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)
    counts = create_stb_db(args.src, args.dst, args.size,
                           workers=args.workers, limit=args.limit)
    print(f"wrote {counts} crops to {args.dst}")


if __name__ == "__main__":
    main()
