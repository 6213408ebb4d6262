"""Convert the persistent solve cache into a native opening-book file.

Full depth-8 book *generation* solves all 91,295 frontier positions
(~60+ hours on this host, PARITY.md); this tool instead packages every
shallow position the solve cache has already paid for into the native
C4BK book format (solver/native/c4solver.cpp Book). The book is PARTIAL
— ``Book::probe`` returns MISS for absent keys and the solver falls
through to search, so a partial book is sound — and it grows with use:
every strength evaluation warms the cache along exactly the opening
distribution the evals replay, so the book converges to a
workload-optimal opening book rather than a uniform one.

Run: python -m custom_alphazero_tpu.tools.book_from_cache \
       [--cache=results/solver_cache.npz] [--out=.../7x6_cache.book] \
       [--max_plies=16]
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

from custom_alphazero_tpu import solver as sv

COL_BITS = sv.HEIGHT + 1
_BOTTOM = sum(1 << (c * COL_BITS) for c in range(sv.WIDTH))
_COL_MASK = (1 << COL_BITS) - 1


def _mirror_bits(x: int) -> int:
    r = 0
    for c in range(sv.WIDTH):
        col = (x >> (c * COL_BITS)) & _COL_MASK
        r |= col << ((sv.WIDTH - 1 - c) * COL_BITS)
    return r


def canonical_key(current: int, mask: int) -> int:
    k = current + mask + _BOTTOM
    km = _mirror_bits(current) + _mirror_bits(mask) + _BOTTOM
    return min(k, km)


def write_book(entries: dict, depth: int, path: str) -> int:
    """entries: {canonical_key: score}; writes the C4BK format
    (magic, version 1, width, height, depth, count, sorted u64 keys,
    i8 scores — c4solver.cpp Book::save)."""
    keys = np.asarray(sorted(entries), np.uint64)
    scores = np.asarray([entries[int(k)] for k in keys], np.int8)
    with open(path, "wb") as fp:
        fp.write(b"C4BK")
        fp.write(struct.pack("<BBBB", 1, sv.WIDTH, sv.HEIGHT, depth))
        fp.write(struct.pack("<Q", len(keys)))
        fp.write(keys.tobytes())
        fp.write(scores.tobytes())
    return len(keys)


def convert(cache_path: str, out_path: str, max_plies: int = 16) -> int:
    data = np.load(cache_path)
    entries: dict = {}
    for (current, mask), score in zip(
        data["keys"].tolist(), data["scores"].tolist()
    ):
        if bin(int(mask)).count("1") > max_plies:
            continue
        entries[canonical_key(int(current), int(mask))] = int(score)
    return write_book(entries, max_plies, out_path)


def main(argv=None):
    from custom_alphazero_tpu.tools.cli import parse_kv_args

    args = parse_kv_args(argv or sys.argv[1:], __doc__)
    cache = args.get("--cache", os.path.join("results", "solver_cache.npz"))
    out = args.get(
        "--out", os.path.join(os.path.dirname(sv.DEFAULT_BOOK),
                              "7x6_cache.book")
    )
    n = convert(cache, out, int(args.get("--max_plies", 16)))
    print(f"book: {n} entries -> {out}")
    return n


if __name__ == "__main__":
    main()
