"""URL canonicalization helpers — pure Python (UDF-side) + native Column
expressions (JVM-side) for the pieces Catalyst can do for free.

The reference delegates URL handling to wpull's URLInfo
(/root/reference/crawler/wpull/plugin.py:77, 112-119, 129-162). The
rebuild's canonical form:

* resolved against the parent page URL (urljoin)
* fragment stripped
* scheme + host lowercased
* default ports removed (http:80 / https:443)
* ``/external-site/?ext_url=X`` unwrapped to X when on the start host
  (plugin.py:134-157 does this at frontier level too, not just parse)

``hostname_with_port`` mirrors wpull's URLInfo.hostname_with_port used
in every host comparison (plugin.py:115-118, 127).
"""

from __future__ import annotations

import re
from typing import Optional
from urllib import parse

EXTERNAL_SITE_RE = re.compile("/external-site/")

_DEFAULT_PORTS = {"http": 80, "https": 443}


def hostname_with_port(url: str) -> Optional[str]:
    """Lowercased ``host`` or ``host:port`` (non-default ports only)."""
    try:
        parsed = parse.urlsplit(url)
        host = parsed.hostname
        port = parsed.port
    except ValueError:
        return None
    if not host:
        return None
    if port and port != _DEFAULT_PORTS.get(parsed.scheme or ""):
        return f"{host}:{port}"
    return host


def canonicalize_url(href: str, base_url: Optional[str] = None) -> Optional[str]:
    """Resolve + normalize one href. Returns None for unusable links."""
    href = (href or "").strip()
    if not href:
        return None
    try:
        resolved = parse.urljoin(base_url, href) if base_url else href
        split = parse.urlsplit(resolved)
    except ValueError:
        return None
    scheme = (split.scheme or "").lower()
    if scheme not in ("http", "https"):
        return None
    host = split.hostname
    if not host:
        return None
    try:
        port = split.port
    except ValueError:
        return None
    netloc = host.lower()
    if port and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{netloc}:{port}"
    path = split.path or "/"
    # The canonical form must be a fixed point of this function: fragment
    # stripping can expose trailing whitespace (href='0 #') that the input
    # .strip() would remove on a second pass, letting one URL enter the
    # seen set under two byte-forms. Strip the final unsplit string so
    # canonicalize(canonicalize(x)) == canonicalize(x).
    out = parse.urlunsplit((scheme, netloc, path, split.query, "")).strip()
    return out or None


def unwrap_external_site(url: str, start_host_with_port: str) -> str:
    """plugin.py:134-157 — replace an /external-site/?ext_url=X URL on
    the start host with X itself (the frontier never fetches the
    wrapper). No-op for everything else."""
    try:
        split = parse.urlsplit(url)
    except ValueError:
        return url
    if not EXTERNAL_SITE_RE.match(split.path or ""):
        return url
    if hostname_with_port(url) != start_host_with_port:
        return url
    ext = parse.parse_qs(split.query).get("ext_url")
    if ext:
        return ext[0]
    return url
