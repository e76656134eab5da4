#!/usr/bin/env python3
"""Content-only fixture-generation fingerprint — the EXACT Python mirror of
graft.plans.ArtifactCache.dataFingerprint (keep the two in lockstep; the
drift and ladder gates compare values produced by both sides).

Definition: for every `*.parquet` entry directly under the fixture dir,
sorted by basename — a single file (driver-written fixtures) or a Spark
part-file directory (ScaleFixture output) — feed MD5 with:
  - the basename (UTF-8);
  - for a file: the length as an 8-byte big-endian long, the first 4 KiB,
    and (if larger) the last min(4 KiB, len-4 KiB) bytes;
  - for a directory: each non-hidden, non-underscore child recursively,
    sorted by name.
No mtimes, no absolute paths: a touch or a copy does NOT change the
fingerprint; any real rewrite does (the parquet footer lives in the tail
sample). First 16 hex chars of the digest.

Usage: python3 tools/fixture_fp.py <sfDir>   # prints the fingerprint
"""
import hashlib, os, struct, sys


def _feed_sample(md, path):
    n = os.path.getsize(path)
    if n <= 0:
        return
    with open(path, "rb") as f:
        md.update(f.read(min(4096, n)))
        if n > 4096:
            tail = min(4096, n - 4096)
            f.seek(n - tail)
            md.update(f.read(tail))


def _feed_entry(md, path):
    md.update(os.path.basename(path).encode("utf-8"))
    if os.path.isfile(path):
        md.update(struct.pack(">q", os.path.getsize(path)))
        _feed_sample(md, path)
    elif os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.startswith(".") or name.startswith("_"):
                continue
            _feed_entry(md, os.path.join(path, name))


def data_fingerprint(sf_dir):
    # Missing/unreadable dir hashes as ZERO entries — the exact Scala-mirror
    # behavior (ArtifactCache.dataFingerprint's Option(listFiles).getOrElse
    # (empty)); callers that must distinguish "no such dir" from "empty dir"
    # check os.path.isdir themselves (check_drift does, and fails closed).
    md = hashlib.md5()
    try:
        entries = sorted(n for n in os.listdir(sf_dir) if n.endswith(".parquet"))
    except OSError:
        entries = []
    for name in entries:
        _feed_entry(md, os.path.join(sf_dir, name))
    return md.hexdigest()[:16]


if __name__ == "__main__":
    print(data_fingerprint(sys.argv[1] if len(sys.argv) > 1
                           else "/root/testdata/sf0.1"))
