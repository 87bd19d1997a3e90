"""S3 naming validation (reference ``s3_naming_helper.py:6-124``).

Pure API-layer checks; local filesystem paths used by the test-suite pass
through untouched (they play the role moto's mock buckets play in the
reference's tests).
"""

from __future__ import annotations

import re

_BUCKET_RE = re.compile(r"^[a-z0-9][a-z0-9.\-]{1,61}[a-z0-9]$")
_IP_RE = re.compile(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")


def _is_local(name: str) -> bool:
    return name.startswith(("/", "file:", "s3a:", "s3:", "hdfs:"))


def validate_bucket_name(bucket_name: str) -> str:
    """AWS bucket rules (``s3_naming_helper.py:51-87``): 3-63 chars, lowercase
    alphanumerics/dots/hyphens, starts+ends alphanumeric, not an IP."""
    if _is_local(bucket_name):
        return bucket_name
    if not 3 <= len(bucket_name) <= 63:
        raise ValueError(f"bucket name {bucket_name!r} must be 3-63 characters")
    if not _BUCKET_RE.match(bucket_name):
        raise ValueError(
            f"bucket name {bucket_name!r} must be lowercase alphanumerics, "
            "dots and hyphens, starting and ending with a letter or number"
        )
    if _IP_RE.match(bucket_name):
        raise ValueError(f"bucket name {bucket_name!r} must not be an IP address")
    if ".." in bucket_name or ".-" in bucket_name or "-." in bucket_name:
        raise ValueError(f"bucket name {bucket_name!r} has invalid punctuation run")
    return bucket_name


def validate_s3_path(path: str) -> str:
    """``validate_s3_path`` (``s3_naming_helper.py:89-115``): must be
    ``s3://bucket[/key...]`` with a valid bucket and safe key characters."""
    if _is_local(path) and not path.startswith(("s3:", "s3a:")):
        return path
    m = re.match(r"^s3a?://([^/]+)(/.*)?$", path)
    if not m:
        raise ValueError(f"{path!r} is not an s3 path")
    validate_bucket_name(m.group(1))
    key = (m.group(2) or "").lstrip("/")
    if re.search(r"[^a-zA-Z0-9!_.*'()\-/=%]", key):
        raise ValueError(f"s3 key {key!r} contains unsafe characters")
    return path


def validate_part(part: str) -> str:
    """Single path component: non-empty, no slashes
    (``s3_naming_helper.py:6-49``)."""
    if not part:
        raise ValueError("path part must not be empty")
    if "/" in part:
        raise ValueError(f"path part {part!r} must not contain '/'")
    return part
