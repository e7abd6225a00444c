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
  | percent-escapes normalized (RFC 3986 §6.2.2.1-2: hex uppercased,
  unreserved characters decoded, reserved left intact)

All steps are pandas ``.str`` ops over the whole Series; the only
non-columnar steps (query-param sort, percent-escape rewrite) run on
exploded fragment tables via ``sort_values``/``map``/``groupby`` — still
no per-row Python.
"""

from __future__ import annotations

import pandas as pd

from .hashing import fnv64

# RFC 3986 unreserved: ALPHA / DIGIT / "-" / "." / "_" / "~" — decoding
# these never introduces a delimiter, so the rewrite is safe on the whole
# URL string before any component split.
_UNRESERVED = (
    set(range(0x41, 0x5B)) | set(range(0x61, 0x7B))
    | set(range(0x30, 0x3A)) | {0x2D, 0x2E, 0x5F, 0x7E}
)
_HEX2CODE = {f"{i:02X}": i for i in range(256)}
_CODE2CHR = {i: chr(i) for i in range(256)}


def pct_normalize(s: pd.Series) -> pd.Series:
    """Normalize %XX escapes: uppercase hex, decode unreserved chars.

    Reference analog: quote/unquote round-trips scattered through fetch
    paths (/root/reference/twitter/get_user_tweets.py:64,
    /root/reference/twitter/timer_twitter.py:42) — without this, ``%7Eu``
    and ``~u`` hash to different url_hash values and duplicate fetches.
    Columnar: split on '%', map the 2-hex prefix of each escape fragment
    through dict lookups, re-join per row.
    """
    has = s.str.contains("%", regex=False)
    if not has.any():
        return s
    frags = s[has].str.split("%").explode()
    first = ~frags.index.duplicated(keep="first")
    hexpart = frags.str[:2].str.upper()
    code = hexpart.map(_HEX2CODE)
    valid = code.notna() & ~first
    unres = valid & code.isin(_UNRESERVED)
    keep = valid & ~unres
    rest = frags.str[2:]
    out = frags.copy()
    bad = ~first & ~valid  # malformed escape: keep the literal '%'
    out[bad] = "%" + frags[bad]
    out[keep] = "%" + hexpart[keep] + rest[keep]
    out[unres] = code[unres].map(_CODE2CHR) + rest[unres]
    joined = out.groupby(level=0).agg("".join)
    s = s.copy()
    s.loc[joined.index] = joined
    return s


# one pass splits scheme / hostport / path / query and drops the fragment
# (the unanchored tail); replaces six full-string regex passes
_SPLIT_RE = r"^(?:([A-Za-z][A-Za-z0-9+.-]*)://)?([^/?#]*)([^?#]*)(?:\?([^#]*))?"


def canon_urls(urls: pd.Series) -> pd.Series:
    """Canonicalize a Series of URL strings (see module docstring).

    Hot-path layout (this kernel is the CPU floor of the frontier bench):
    ONE anchored extract splits every component; the expensive rewrite
    passes (// collapse, dot-segment resolution) run only on the row
    subset that contains their trigger substring — plain URLs pay a
    single extract plus short-string host/port ops.
    """
    s = urls.fillna("").astype(str).str.strip()
    s = pct_normalize(s)

    parts = s.str.extract(_SPLIT_RE)
    scheme = parts[0].str.lower()
    hostport = parts[1]
    path = parts[2]
    query = parts[3]

    host = hostport.str.replace(r":\d+$", "", regex=True).str.lower()
    host = host.str.replace(r"^www\.", "", regex=True).str.rstrip(".")
    port = hostport.str.extract(r":(\d+)$", expand=False)
    default_port = pd.Series(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")),
        index=s.index,
    )
    port_part = port.where(~default_port & port.notna(), None)
    port_sfx = (":" + port_part).fillna("")

    path = path.replace("", "/")
    slashes = path.str.contains("//", regex=False)
    if slashes.any():
        path.loc[slashes] = path.loc[slashes].str.replace(r"//+", "/", regex=True)
    # resolve dot segments: bounded regex passes, only on rows with "/."
    dots = path.str.contains("/.", regex=False)
    if dots.any():
        sub = path.loc[dots]
        for _ in range(16):
            before = sub
            sub = sub.str.replace(r"/\./", "/", regex=True)
            sub = sub.str.replace(r"/[^/]+/\.\./", "/", regex=True)
            sub = sub.str.replace(r"/\.$", "/", regex=True)
            sub = sub.str.replace(r"/[^/]+/\.\.$", "/", regex=True)
            if before.equals(sub):
                break
        path.loc[dots] = sub
    trail = (path.str.len() > 1) & path.str.endswith("/")
    if trail.any():
        path.loc[trail] = path.loc[trail].str.rstrip("/")
    path = path.mask(path == "", "/")

    # query: drop utm_*, sort params (explode -> sort -> rejoin; columnar)
    q = _canon_query(query)

    out = scheme.fillna("http") + "://" + host + port_sfx + path + q
    return out.where(host.str.len() > 0, s)


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
