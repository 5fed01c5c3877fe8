"""Bulk-container reads and CSV separator autodetection.

- :func:`materialize_zip`: the reference's BulkResourceBasedDataset /
  BulkDataSource (``silk-core/.../dataset/bulk/BulkDataSource.scala:24``,
  ``BulkResourceBasedDataset.scala:24``) reads a zip-of-files as one
  concatenated source. Ray Data readers want paths, so a zip is
  extracted ONCE into a content-keyed cache directory under /tmp and
  read as a directory — idempotent across runs (the key includes
  mtime+size, so a replaced zip re-extracts), safe against zip-slip
  (absolute or ``..`` member names are refused loudly).

- :func:`detect_separator`: the reference's entropy-based CSV
  separator detection (``silk-plugins/silk-plugins-csv/.../
  CsvSeparatorDetector.scala``): for each candidate separator, parse
  the first N lines and build the distribution of per-line field
  counts; drop candidates where at least half the lines yield a single
  field; pick the lowest-entropy distribution (must be < 0.1 — i.e.
  the field count is near-constant); the majority field count then
  drives skip-lines detection (leading junk lines whose field count
  differs from the body).
"""

from __future__ import annotations

import csv
import hashlib
import io
import math
import os
import zipfile

SEPARATOR_CANDIDATES = (",", "\t", ";", "|", "^", "#")
_BULK_CACHE = "/tmp/silkray_bulk"


def materialize_zip(path: str) -> str:
    """Extract a zip container to a cached directory and return it."""
    st = os.stat(path)
    key = hashlib.sha1(
        f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:16]
    out = os.path.join(_BULK_CACHE, key)
    # marker lives OUTSIDE the extraction dir: format readers list that
    # dir, and not every reader skips dot/underscore names
    done = os.path.join(_BULK_CACHE, f"{key}.done")
    if os.path.exists(done):
        return out
    # concurrency-safe publish: extract into a private per-process temp
    # dir, then atomically rename it into place — `out` only ever
    # exists COMPLETE, so a second process that loses the rename race
    # simply reads the winner's directory (no torn reads of a
    # half-extracted cache)
    os.makedirs(_BULK_CACHE, exist_ok=True)
    tmp = f"{out}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    with zipfile.ZipFile(path) as z:
        for m in z.infolist():
            name = m.filename
            if name.startswith(("/", "\\")) or ".." in name.split("/"):
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
                raise ValueError(f"refusing unsafe zip member {name!r} in {path!r}")
            z.extract(m, tmp)
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        if not os.path.isdir(out):  # not a lost race — real failure
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    with open(done, "w") as f:
        f.write("ok")
    return out


def expand_containers(paths) -> list[str]:
    """Replace any ``.zip`` entries with their extracted directories."""
    if isinstance(paths, (str, bytes)):
        paths = [paths]
    out = []
    for p in paths:
        if isinstance(p, str) and p.lower().endswith(".zip") and os.path.isfile(p):
            out.append(materialize_zip(p))
        else:
            out.append(p)
    return out


def _entropy(dist: dict[int, int]) -> float:
    total = sum(dist.values())
    if not total:
        return 0.0
    s = 0.0
    for c in dist.values():
        if c > 0:
            p = c / total
            s += p * math.log(p)
    return -s


def detect_separator(path: str, max_lines: int = 100) -> tuple[str, int]:
    """Return ``(separator, skip_lines)`` for a CSV file, or ``(",",
    0)`` when nothing qualifies (the reference returns None and the
    caller keeps its configured default)."""
    with open(path, encoding="utf-8", errors="replace") as f:
        sample = [line for _, line in zip(range(max_lines), f)]
    if not sample:
        return ",", 0
    results: dict[str, dict[int, int]] = {}
    for sep in SEPARATOR_CANDIDATES:
        dist: dict[int, int] = {}
        reader = csv.reader(io.StringIO("".join(sample)), delimiter=sep)
        try:
            for row in reader:
                n = len(row)
                dist[n] = dist.get(n, 0) + 1
        except csv.Error:
            continue
        results[sep] = dist
    # drop separators that leave >= half the lines unsplit
    candidates = {
        sep: dist
        for sep, dist in results.items()
        if dist and dist.get(1, 0) / sum(dist.values()) < 0.5
    }
    if not candidates:
        return ",", 0
    sep, dist = min(candidates.items(), key=lambda kv: _entropy(kv[1]))
    if _entropy(dist) >= 0.1:
        return ",", 0
    body_fields = max(dist.items(), key=lambda kv: kv[1])[0]
    skip = 0
    for row in csv.reader(io.StringIO("".join(sample)), delimiter=sep):
        if len(row) == body_fields:
            break
        skip += 1
    return sep, skip
