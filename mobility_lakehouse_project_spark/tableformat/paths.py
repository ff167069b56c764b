"""Location/path normalization for table storage.

The table location may be a plain POSIX path (this sandbox) or an
object-store URI (``s3a://bucket/table`` — the reference runs against
S3 + httpfs, dags/Bronze_Ingest_Dag.py:30-59). Every place that
relativizes an absolute path/URI against the table location (e.g.
``input_file_name()`` results in MERGE planning) goes through ONE
normalizer so scheme differences can't silently mis-relativize:
Spark reports local files as ``file:///abs/...`` while the table
location is ``/abs/...``, and an ``s3a://`` location must never be
fed to os.path.abspath (which would mangle the double slash).
"""

from __future__ import annotations

import os
import re

_SCHEME = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?")


def is_uri(p: str) -> bool:
    return "://" in p


def normalize_location(location: str) -> str:
    """Canonical table location: absolute for local paths, trailing
    slash stripped for URIs (never abspath'd — it mangles schemes)."""
    if is_uri(location):
        return location.rstrip("/")
    return os.path.abspath(location)


def strip_scheme(p: str) -> str:
    """Drop a leading URI scheme, handling both 'scheme://x' and the
    single-slash 'file:/x' form Spark sometimes reports."""
    m = _SCHEME.match(p)
    return p[m.end():] if m else p


def relativize(path_or_uri: str, base: str) -> str:
    """Table-relative path of a file under ``base``, robust to scheme
    mismatches (file:///x or file:/x vs /x, s3a://b/t vs s3a://b/t/).
    The base must match as a PREFIX after scheme stripping — a base
    that merely appears mid-path (/x/a/b vs base /a) never matches.
    Returns the input unchanged when it does not lie under base."""
    sp = strip_scheme(path_or_uri)
    sb = strip_scheme(base).rstrip("/")
    if sp.startswith(sb + "/"):
        return sp[len(sb) + 1 :]
    return path_or_uri


def relativize_reported(reported_uri: str, base: str) -> str:
    """Relativize a Spark-REPORTED file URI (``input_file_name()``)
    against a table location, decoding percent-escapes on BOTH sides.

    Spark reports percent-encoded URIs (space -> %20) while manifest
    ``file_path`` entries are plain decoded relative names; a location
    that itself contains a percent-encodable character (a ``file:``
    URI with a space) must therefore be compared in decoded form too —
    decoding only the reported side makes every file under such a
    location fail to resolve (DELETE/MERGE abort on their resolution
    guard: fail-safe, but unusable at that location)."""
    from urllib.parse import unquote

    return relativize(unquote(reported_uri), unquote(base))


def to_local(location: str) -> str:
    """Driver-side filesystem root for a table location.

    ``file:``-scheme URIs map to their plain local path (percent-
    decoded — a URI location may encode spaces); plain paths pass
    through. Other schemes (s3a://, hdfs://) pass through UNCHANGED:
    constructing a table object at a remote location stays valid (all
    derived paths keep the URI form), and the driver-side metadata I/O
    (open/os/pyarrow) fails at use time — a production deployment swaps
    that I/O for a Hadoop-FS/boto shim, while all Spark-side reads/
    writes and the relativize() matching already handle remote URIs."""
    if not is_uri(location):
        return location
    m = _SCHEME.match(location)
    scheme = location[: m.end()].rstrip(":/").lower()
    if scheme != "file":
        return location
    from urllib.parse import unquote

    return unquote(strip_scheme(location))


def join_path(base: str, *parts: str) -> str:
    """Join under a location; URI-safe (plain '/' joining for URIs)."""
    if is_uri(base):
        return "/".join([base.rstrip("/")] + [p.strip("/") for p in parts])
    return os.path.join(base, *parts)
