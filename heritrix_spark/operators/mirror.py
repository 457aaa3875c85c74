"""MirrorWriterProcessor path law — URI → site-mirror file path.

Reference: MirrorWriterProcessor.java (modules/.../writer/), the
processor that lays fetched resources out on disk as a browsable site
mirror.  The path-construction law is reimplemented in full:

- LumpyString (:1340-1630): the segment string is built lump-by-lump —
  each %XX escape and each character-map replacement is atomic — and
  any trimming removes whole lumps from the end (trimToMax :1567-1584
  cuts at the nearest lump boundary); construction stops (returns) at
  the first lump that would exceed maxLen (:1464-1467).
- DirSegment (:903-955): dotBegin replaces a leading '.'; the dotEnd
  loop chops trailing dots and re-appends dotEnd while it fits
  (:944-954); underscoreSet prepends '_' to configured names (:976-982).
- EndSegment (:1128-1160): the suffix is the part after the LAST dot
  strictly inside the segment (:1133-1137); a contentTypeMap
  replacement suffix wins (:511-527, first case-insensitive prefix
  match); the main part reserves pad = suffix + query room; maxSegLen
  is one less for end segments and maxPathLen one less overall (the
  atomic-rename "N" byte, :1161-1163 / super(maxSegLen-1) :1131).
- trimWithPadding (:1296-1338): trim priority is query-shorten →
  query-drop → mainPart (floor 1) → suffix (floor 1), each checked
  against lenAvail = min(maxSegLen, maxPathLen - dirPathLen) headroom.
- joinParts (:1222-1246): suffixAtEnd=true → main+unique+query+'.'+sfx;
  false → main+unique+'.'+sfx+query.
- uriToFile (:485-713): host directory (with hostMap renames), port
  directory only for explicit ports, dirFile ("index.html") for
  trailing-slash URIs, and the tooLongDirectory fallback when the
  directory chain exceeds maxPathLen - maxSegLen (:700-710).
- innerProcess (:342-356): only http/https URIs produce paths.

What is deliberately restated: the reference's uniqueness loop
(DirSegment/EndSegment addToPath) numbers collisions by stat()ing the
live filesystem row-by-row — inherently sequential state.  At 10^10
rows nothing can stat per row; the batch law here resolves collisions
*within the dataset*: rows whose full path collides case-insensitively
(caseSensitiveFilesystem=false semantics; exact-duplicate URLs always)
get the same NumberFormat "1", "2", ... unique parts by a
deterministic order — one window over the case-folded path, then the
same trim/join law re-applied with the unique part (exactly the i>0
branch of EndSegment.addToPath :1165-1180).

Defaults mirror the reference's (:119-316): dotBegin "%2E" active,
dotEnd "." (= inactive), directoryFile "index.html", host dir on, port
dir off, maxPathLength 1023, maxSegLength 255, suffixAtEnd true,
tooLongDirectory "LONG", base path "mirror" under ".".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEXDIGITS = set("0123456789abcdefABCDEF")


class _Lumpy:
    """LumpyString: a string as a list of atomic lumps."""

    def __init__(
        self,
        s: str,
        begin: int,
        end: int,
        padding: int,
        max_len: int,
        char_map: dict,
        dot_begin: str | None,
    ) -> None:
        self.max_len = max_len
        self.lumps: list[str] = []
        self._len = 0
        i = begin
        while i < end:
            c = s[i]
            if c == "." and i == begin and dot_begin is not None:
                lump = dot_begin
            else:
                lump = char_map.get(c)
            if lump is None:
                if (
                    c == "%"
                    and (end - i) > 2
                    and s[i + 1] in _HEXDIGITS
                    and s[i + 2] in _HEXDIGITS
                ):
                    lump = s[i : i + 3]
                    i += 2
                else:
                    lump = c
            if self._len + len(lump) > max_len:
                return  # constructor stops at maxLen (:1464-1467)
            self.append(lump)
            i += 1

    def append(self, lump: str) -> None:
        self.lumps.append(lump)
        self._len += len(lump)

    def prepend(self, ch: str) -> None:
        self.lumps.insert(0, ch)
        self._len += len(ch)

    def length(self) -> int:
        return self._len

    def endswith(self, ch: str) -> bool:
        return self._len > 0 and self.lumps[-1].endswith(ch)

    def trim_to_max(self, max_len: int) -> None:
        # whole-lump removal == the aux[] boundary walk (:1567-1584)
        while self._len > max_len:
            self._len -= len(self.lumps.pop())

    def tostr(self) -> str:
        return "".join(self.lumps)


def _nf(i: int) -> str:
    """NumberFormat.getIntegerInstance().format — grouping commas."""
    return f"{i:,}"


def _dir_segment(
    text: str,
    max_seg: int,
    char_map: dict,
    dot_begin: str | None,
    dot_end: str | None,
    underscore_set: set | None,
) -> str:
    ls = _Lumpy(
        text, 0, len(text), len(dot_end) if dot_end else 0, max_seg,
        char_map, dot_begin,
    )
    if dot_end is not None:
        while ls.endswith("."):
            ls.trim_to_max(ls.length() - 1)
            if ls.length() + len(dot_end) <= max_seg:
                ls.append(dot_end)
    seg = ls.tostr()
    if underscore_set and seg.lower() in underscore_set:
        ls.prepend("_")
        ls.trim_to_max(max_seg)
        seg = ls.tostr()
    return seg


class _EndSegment:
    def __init__(
        self,
        text: str,
        max_seg: int,
        char_map: dict,
        dot_begin: str | None,
        query: str | None,
        suffix: str | None,
        max_path: int,
        suffix_at_end: bool,
    ) -> None:
        self.max_seg = max_seg - 1  # super(maxSegLen - 1) :1131
        mpe = len(text)
        di = text.rfind(".")
        if 0 < di < len(text) - 1:  # ldi strictly inside (:1133-1137)
            mpe = di
        self.suffix = suffix
        if self.suffix is None and mpe < len(text) - 1:
            self.suffix = _Lumpy(
                text, mpe + 1, len(text), 0, self.max_seg, char_map, None
            ).tostr()
        pad = ((1 + len(self.suffix)) if self.suffix is not None else 0) + (
            len(query) if query is not None else 0
        )
        self.main = _Lumpy(text, 0, mpe, pad, self.max_seg, char_map, dot_begin)
        self.max_path = max_path - 1  # :1161-1163
        self.query = (
            _Lumpy(query, 0, len(query), 0, self.max_seg, char_map, None)
            if query is not None
            else None
        )
        self.suffix_at_end = suffix_at_end
        self.unique = None

    def _length(self) -> int:
        r = self.main.length()
        if self.unique is not None:
            r += len(self.unique)
        if self.query is not None:
            r += self.query.length()
        if self.suffix is not None:
            r += 1 + len(self.suffix)
        return r

    def _len_avail(self, dir_path_len: int) -> int:
        ln = self._length()
        return min(self.max_seg - ln, self.max_path - dir_path_len - ln)

    def _trim_with_padding(self, padding: int, dir_path_len: int) -> None:
        la = self._len_avail(dir_path_len)
        if la >= padding:
            return
        if self.query is not None:
            self.query.trim_to_max(max(0, self.query.length() - (padding - la)))
            if self.query.length() == 0:
                self.query = None
            la = self._len_avail(dir_path_len)
            if la >= padding:
                return
        self.main.trim_to_max(max(1, self.main.length() - (padding - la)))
        la = self._len_avail(dir_path_len)
        if la >= padding:
            return
        if self.suffix is not None:
            self.suffix = self.suffix[
                : max(1, len(self.suffix) - (padding - la))
            ]
            la = self._len_avail(dir_path_len)
            if la >= padding:
                return
        raise ValueError("can not trim end segment")  # :1335-1337

    def render(self, dir_path_len: int, unique_i: int = 0) -> str:
        if unique_i > 0:
            self.unique = _nf(unique_i)
        self._trim_with_padding(
            len(self.unique) if self.unique is not None else 0, dir_path_len
        )
        sb = [self.main.tostr()]
        if self.unique is not None:
            sb.append(self.unique)
        if self.suffix_at_end:
            if self.query is not None:
                sb.append(self.query.tostr())
            if self.suffix is not None:
                sb.append("." + self.suffix)
        else:
            if self.suffix is not None:
                sb.append("." + self.suffix)
            if self.query is not None:
                sb.append(self.query.tostr())
        return "".join(sb)


def mirror_path_py(
    url: str | None,
    content_type: str | None = None,
    *,
    base_dir: str = "./mirror",
    character_map: dict | None = None,
    content_type_map: list | None = None,
    dot_begin: str | None = "%2E",
    dot_end: str | None = ".",
    directory_file: str = "index.html",
    create_host_directory: bool = True,
    host_map: list | None = None,
    max_path_length: int = 1023,
    max_seg_length: int = 255,
    create_port_directory: bool = False,
    suffix_at_end: bool = True,
    too_long_directory: str = "LONG",
    underscore_set: set | None = None,
    unique_i: int = 0,
) -> str | None:
    """The full uriToFile law (:485-713); returns the path relative to
    base_dir (the A_MIRROR_PATH value), or None for non-http(s)/
    unparseable URIs.  ``unique_i`` > 0 renders the batch-collision
    numbered variant (EndSegment.addToPath i>0 branch)."""
    import re

    if url is None:
        return None
    m = re.match(r"(?i)^(https?)://([^/?#]+)(/[^?#]*)?(?:\?([^#]*))?", url)
    if not m:
        return None
    _, authority, path, query = m.groups()
    if path is None or path == "":
        path = "/"
    host = authority
    port = -1
    pm = re.match(r"^(.*):(\d+)$", authority)
    if pm:
        host, port = pm.group(1), int(pm.group(2))

    if not create_host_directory:
        host = None
    elif host_map and len(host_map) > 1:
        pairs = host_map[: len(host_map) - (len(host_map) % 2)]
        for h1, h2 in zip(pairs[0::2], pairs[1::2]):
            if host.lower() == (h1 or "").lower():
                if h2:
                    host = h2
                break
    if not create_port_directory:
        port = -1

    suffix = None
    if content_type_map and len(content_type_map) > 1 and content_type:
        pairs = content_type_map[: len(content_type_map) - (len(content_type_map) % 2)]
        ct = content_type.lower()
        for c, suf in zip(pairs[0::2], pairs[1::2]):
            if c is not None and ct.startswith(c.lower()):
                if suf:
                    suffix = suf
                break

    max_seg = max(max_seg_length, 2)
    max_path = max(max_path_length, 2)
    char_map = {
        k: v
        for k, v in (character_map or {}).items()
        if k is not None and len(k) == 1 and v
    }
    if dot_begin == ".":
        dot_begin = None
    if dot_end == ".":
        dot_end = None
    tld = too_long_directory
    if not tld or "/" in tld:
        tld = "LONG"
    uset = {s.lower() for s in underscore_set or () if s}

    raw_segs = path.split("/")[1:]
    dir_texts = raw_segs[:-1]
    end_text = raw_segs[-1]
    if end_text == "":
        end = _EndSegment(
            directory_file, max_seg, char_map, None, query, suffix,
            max_path, suffix_at_end,
        )
    else:
        end = _EndSegment(
            end_text, max_seg, char_map, dot_begin, query, suffix,
            max_path, suffix_at_end,
        )

    def assemble(dirs: list[str], cmap: dict, db, de, us) -> tuple | None:
        # URIToFileReturn accounting: full path incl. base_dir (:1652-1672)
        full = base_dir.rstrip("/") if len(base_dir) > 1 else base_dir
        rel: list[str] = []
        if host is not None:
            full += "/" + host
            rel.append(host)
        if port > 0:
            full += "/" + str(port)
            rel.append(str(port))
        budget = max_path - max_seg  # dirPath maxLen (:697)
        for t in dirs:
            seg = _dir_segment(t, max_seg, cmap, db, de, us)
            full += "/" + seg
            rel.append(seg)
            if len(full) > budget:
                return None
        return full, rel

    r = assemble(dir_texts, char_map, dot_begin, dot_end, uset)
    if r is None:  # tooLongDirectory fallback (:700-710)
        r = assemble([tld], {}, None, None, None)
        if r is None:
            raise ValueError("base path too long for tooLongDirectory")
    full, rel = r
    fname = end.render(1 + len(full), unique_i)
    rel.append(fname)
    return "/".join(rel)


def mirror_paths(
    df: DataFrame,
    url_col: str = "url",
    content_type_col: str | None = None,
    order_col: str | None = None,
    out_col: str = "mirror_path",
    **cfg,
) -> DataFrame:
    """Vectorized mirror-path assignment with batch collision numbering.

    One Arrow pandas UDF computes every row's base path; one window
    over the case-folded path (caseSensitiveFilesystem=false — exact
    dupes collide either way) ranks collisions by ``order_col`` (or the
    URL) and a second UDF re-renders ranked rows with the NumberFormat
    unique part — the i>0 loop of EndSegment.addToPath restated for a
    batch.  Shuffle cost: the one window exchange; path construction
    itself is embarrassingly parallel."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ct = F.col(content_type_col) if content_type_col else F.lit(None)

    def _base(urls, cts):
        return pd.Series(
            [mirror_path_py(u, c, **cfg) for u, c in zip(urls, cts)]
        )

    def _numbered(urls, cts, seqs):
        return pd.Series(
            [
                mirror_path_py(u, c, unique_i=int(i), **cfg)
                for u, c, i in zip(urls, cts, seqs)
            ]
        )

    base_path = pandas_udf(_base, "string")
    numbered_path = pandas_udf(_numbered, "string")

    order = F.col(order_col) if order_col else F.col(url_col)
    w = Window.partitionBy(F.lower(F.col("__mp"))).orderBy(order)
    return (
        df.withColumn("__mp", base_path(F.col(url_col), ct))
        .withColumn("__seq", F.row_number().over(w) - 1)
        .withColumn(
            out_col,
            F.when(F.col("__mp").isNull(), F.lit(None))
            .when(F.col("__seq") == 0, F.col("__mp"))
            .otherwise(numbered_path(F.col(url_col), ct, F.col("__seq"))),
        )
        .drop("__mp", "__seq")
    )
