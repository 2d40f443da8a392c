"""PIRGenerateDatabase: synthesize a keyword-value test database
(reference Sources/PIRGenerateDatabase/main.swift:21-120)."""

from __future__ import annotations

import argparse
import os
import sys

from ..io import pb
from . import util


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate a keyword PIR test database")
    parser.add_argument("--output-database", required=True, help=".binpb/.txtpb output")
    parser.add_argument("--row-count", type=int, required=True)
    parser.add_argument("--value-size", required=True, help="fixed size or 'min..max' range")
    parser.add_argument(
        "--value-type",
        choices=["random", "repeated"],
        default="random",
        help="random bytes or the keyword repeated",
    )
    parser.add_argument("--first-keyword", type=int, default=0)
    args = parser.parse_args(argv)

    if ".." in args.value_size:
        lo, hi = (int(v) for v in args.value_size.split(".."))
    else:
        lo = hi = int(args.value_size)
    import random as rnd

    rng = rnd.Random(0)
    db = pb.pir_pb2.KeywordDatabase()
    for i in range(args.first_keyword, args.first_keyword + args.row_count):
        row = db.rows.add()
        keyword = str(i).encode()
        row.keyword = keyword
        size = rng.randint(lo, hi)
        if args.value_type == "random":
            row.value = bytes(rng.randrange(256) for _ in range(size))
        else:
            row.value = (keyword * (size // max(len(keyword), 1) + 1))[:size]
    util.save_proto(args.output_database, db)
    print(f"Wrote {args.row_count} rows to {args.output_database}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
