"""Vectorized URL canonicalization + parsing (pandas string kernels).

Composes the reference's scattered URL scalar ops — component split
(/root/reference/nft/get_opensea_v1.1.py:249-250,
/root/reference/twitter/timer_twitter.py:67-69), quote/unquote
(/root/reference/twitter/get_user_tweets.py:64), string rewrites
(/root/reference/medium/get_medium1.0.py:58) — into one deterministic
canonical form:

  scheme lower | host lower, no leading www., no default port, no
  trailing dot | fragment dropped | utm_* params dropped, remaining query
  params sorted | dot-segments resolved | trailing slash trimmed (non-root)

All steps are pandas ``.str`` ops over the whole Series; the only
non-columnar step (query-param sort) runs on the exploded param table via
``sort_values``/``groupby`` — still no per-row Python.
"""

from __future__ import annotations

import pandas as pd

from .hashing import fnv64


def canon_urls(urls: pd.Series) -> pd.Series:
    """Canonicalize a Series of URL strings (see module docstring)."""
    s = urls.fillna("").astype(str).str.strip()
    # split off fragment
    s = s.str.replace(r"#.*$", "", regex=True)
    # split query
    base = s.str.replace(r"\?.*$", "", regex=True)
    query = s.str.extract(r"\?(.*)$", expand=False)

    # scheme://host[:port]/path
    scheme = base.str.extract(r"^([A-Za-z][A-Za-z0-9+.-]*)://", expand=False).str.lower()
    rest = base.str.replace(r"^[A-Za-z][A-Za-z0-9+.-]*://", "", regex=True)
    hostport = rest.str.replace(r"/.*$", "", regex=True)
    path = rest.str.replace(r"^[^/]*", "", regex=True)

    host = hostport.str.replace(r":\d+$", "", regex=True).str.lower()
    host = host.str.replace(r"^www\.", "", regex=True).str.rstrip(".")
    port = hostport.str.extract(r":(\d+)$", expand=False)
    default_port = pd.Series(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")),
        index=s.index,
    )
    port_part = port.where(~default_port & port.notna(), None)
    port_sfx = (":" + port_part).fillna("")

    # resolve dot segments: iterate bounded regex passes (depth <= 16)
    path = path.replace("", "/")
    path = path.str.replace(r"//+", "/", regex=True)
    for _ in range(16):
        before = path
        path = path.str.replace(r"/\./", "/", regex=True)
        path = path.str.replace(r"/[^/]+/\.\./", "/", regex=True)
        path = path.str.replace(r"/\.$", "/", regex=True)
        path = path.str.replace(r"/[^/]+/\.\.$", "/", regex=True)
        if before.equals(path):
            break
    path = path.mask((path.str.len() > 1) & path.str.endswith("/"), path.str.rstrip("/"))
    path = path.mask(path == "", "/")

    # query: drop utm_*, sort params (explode -> sort -> rejoin; columnar)
    q = _canon_query(query)

    out = scheme.fillna("http") + "://" + host + port_sfx + path + q
    return out.where(host.str.len() > 0, urls.fillna("").astype(str).str.strip())


def _canon_query(query: pd.Series) -> pd.Series:
    has_q = query.notna() & (query.str.len() > 0)
    if not has_q.any():
        return pd.Series("", index=query.index)
    parts = query[has_q].str.split("&").explode()
    parts = parts[(parts.str.len() > 0) & ~parts.str.match(r"^utm_[^=]*(=|$)")]
    parts = parts.sort_values(kind="stable").sort_index(kind="stable")
    joined = parts.groupby(level=0).agg("&".join)
    out = pd.Series("", index=query.index)
    nonempty = joined[joined.str.len() > 0]
    out.loc[nonempty.index] = "?" + nonempty
    return out


def url_host(urls: pd.Series) -> pd.Series:
    """Host component of (already canonical) URLs."""
    return (
        urls.fillna("")
        .astype(str)
        .str.replace(r"^[A-Za-z][A-Za-z0-9+.-]*://", "", regex=True)
        .str.replace(r"[/:?#].*$", "", regex=True)
    )


def url_hash(urls: pd.Series) -> pd.Series:
    """Canonical 64-bit URL hash (fnv64 over the canonical form)."""
    return pd.Series(fnv64(urls), index=urls.index)
