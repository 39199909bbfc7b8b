"""Deterministic HTML → text extraction.

This is the pipeline's "codec": the per-row invariant in
``BASELINE.json.input_hint`` is *byte-identical extracted text per url*,
so the extractor is defined here once as a pure-Python function
(``extract_text``) that serves as both the oracle (applied row-wise in
tests / the datagen reference column) and the engine path (applied
vectorized over Arrow batches via ``extract_text_udf``). No third-party
HTML library — semantics cannot drift with a C-extension version.

Reference counterpart: Logstash codecs decode bytes→event
(logstash-core/lib/logstash/codecs/base.rb, ``Codec#decode``); the
closest shipped analogue is the plain/line codec filling ``message``.
The HTML-specific behavior is this graft's payload (Common-Crawl-style
pages), specified by SURVEY.md §1.2/§7-M1.

Extraction semantics (frozen; tests pin them byte-for-byte):

1. Drop ``<script>``/``<style>``/``<noscript>`` elements including
   their content (case-insensitive).
2. Drop HTML comments ``<!-- ... -->`` and doctypes.
3. Block-level open/close tags become a newline; all other tags become
   a single space (so inline markup never glues words together).
4. Entities are unescaped (``&amp;`` → ``&``, numeric forms too).
5. Whitespace is normalized: runs of spaces/tabs collapse to one
   space, each line is stripped, empty lines dropped, lines joined
   with ``\n``. Output is a str (UTF-8 on disk).
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd

_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|td|th|thead|tbody|section|"
    "article|header|footer|nav|aside|main|blockquote|pre|form|hr|title"
)

_RE_DROP = re.compile(
    r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_DOCTYPE = re.compile(r"<!DOCTYPE[^>]*>", re.IGNORECASE)
_RE_BLOCK = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*>", re.IGNORECASE)
_RE_TAG = re.compile(r"<[^>]+>")
# Whitespace collapse, decomposed for speed. The naive [ \t\r\f\v]+ sub
# spends most of its time replacing SINGLE spaces with themselves (80%
# of total extraction time measured on ~15 KB pages). Equivalent fast
# form, fuzz-verified byte-identical: map the rare non-space whitespace
# to spaces (C-speed translate, skipped entirely when absent), then
# collapse only runs of 2+ spaces.
_RE_SPACES2 = re.compile(" {2,}")
_WS_TRANSLATE = str.maketrans({"\t": " ", "\r": " ", "\f": " ", "\v": " "})


def _collapse_ws(s: str) -> str:
    if "\t" in s or "\r" in s or "\f" in s or "\v" in s:
        s = s.translate(_WS_TRANSLATE)
    # Fixpoint double-space replace ≡ _RE_SPACES2.sub(" ", s) (each pass
    # halves every run; terminates when no "  " remains) but runs on the
    # C memmem fast path — measured 1.6× the regex sub on ~20 KB pages.
    while "  " in s:
        s = s.replace("  ", " ")
    return s


def extract_text(html_bytes: bytes | str | None) -> str | None:
    """Pure-Python deterministic extractor — the byte-identity oracle."""
    if html_bytes is None:
        return None
    if isinstance(html_bytes, (bytes, bytearray)):
        raw = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    s = _RE_DROP.sub(" ", raw)
    s = _RE_COMMENT.sub(" ", s)
    s = _RE_DOCTYPE.sub(" ", s)
    s = _RE_BLOCK.sub("\n", s)
    s = _RE_TAG.sub(" ", s)
    s = _html.unescape(s)
    # ONE global whitespace-collapse pass: the patterns cannot cross \n,
    # so this is byte-identical to the per-line sub it replaces.
    s = _collapse_ws(s)
    # filter(None, map(str.strip, ...)) ≡ the genexp form (strip then drop
    # empties) with the loop pushed to C — measured 1.3× on fat pages.
    return "\n".join(filter(None, map(str.strip, s.split("\n"))))


def extract_series(s: pd.Series) -> pd.Series:
    """Arrow-batch vectorized form (pd.Series of bytes → pd.Series of str).

    The hot loop is the compiled-regex engine over each batch; no
    per-row Python dispatch beyond the list comprehension over the
    Arrow batch (the same shape every vectorized string kernel has).
    """
    return pd.Series(
        [extract_text(v) for v in s],
        index=s.index,
        dtype="object",
    )


def extract_text_udf():
    """Return a pandas_udf (binary → string) for DataFrame use.

    Built lazily so importing this module never requires an active
    SparkSession (the oracle path stays Spark-free).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield extract_series(s)

    return _extract


# ---------------------------------------------------------------------------
# JVM-native lowering (round 5).
#
# The pure-Python extractor above is the byte-identity ORACLE; at 100 TB it
# is also the dominant cost (~12 MB/s per 32 cores measured in BENCH_r04).
# The chain below re-expresses steps 1–5 of the frozen semantics as Catalyst
# string expressions (regexp_replace / replace / translate — all whole-stage
# codegen, zero Python hops), and a GUARD predicate routes the rows whose
# content falls outside the proven-identical domain to the oracle pandas_udf.
# The guard feeds the UDF NULL for every fast-path row, so Arrow ships only
# validity bits for them — the Python worker round-trip stays near-free when
# no row is flagged.
#
# Proven-identical domain (everything else → oracle, never wrong, just slower):
#   * html is valid UTF-8 (checked with F.is_valid_utf8 on the binary→string
#     cast, which Spark performs without validation or copying);
#   * after tag stripping, every '&' followed by [#A-Za-z] is exactly one of
#     the supported entity literals below (Python html.unescape additionally
#     handles semicolon-less legacy names, longest-prefix matching, arbitrary
#     numeric code points and the Windows-1252 remap table — all guarded);
#   * no NUL byte (NUL is the sentinel the '&'-producing replacements use to
#     stay single-pass, see below).
#
# Java-vs-Python regex alignment choices (each one fuzz-tested in
# tests/test_extract_native.py):
#   * Python \b after a tag name  →  (?![\p{L}\p{N}_]) with (?u) so Unicode
#     word chars behave like Python str patterns;
#   * Python (?i) is Unicode-aware  →  Java (?iu);
#   * Python (?m)/$ only treat \n as a line break  →  Java (?d) UNIX_LINES;
#   * Python str \s  →  the explicit _PYWS class (Java \s is ASCII-only).
# ---------------------------------------------------------------------------

# Python str regex \s, spelled out for Java (order: ASCII, C1, Unicode Zs/Zl/Zp).
_PYWS = (
    " \\t\\n\\r\\u000B\\f\\u001C-\\u001F\\u0085\\u00A0\\u1680"
    "\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000"
)
# Same minus \n (used for per-line strip after \t\r\f\v were translated away).
_PYWS_NONL = (
    " \\t\\r\\u000B\\f\\u001C-\\u001F\\u0085\\u00A0\\u1680"
    "\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000"
)
_NOT_WORD = "(?![\\p{L}\\p{N}_])"

_J_DROP = (
    "(?isu)<(script|style|noscript)" + _NOT_WORD + "[^>]*>.*?</\\1[" + _PYWS + "]*>"
)
_J_COMMENT = "(?s)<!--.*?-->"
_J_DOCTYPE = "(?iu)<!DOCTYPE[^>]*>"
_J_BLOCK = "(?iu)</?(?:" + _BLOCK_TAGS + ")" + _NOT_WORD + "[^>]*>"
_J_TAG = "<[^>]+>"

# Supported entity literals (case-sensitive, semicolon-terminated — exactly
# the forms html.unescape maps to the same single character). Split into the
# '&'-producing group (replaced via a NUL sentinel LAST so the chain keeps
# html.unescape's single-pass semantics: '&amp;lt;' must yield '&lt;', not
# '<') and everything else. The test suite asserts every entry against
# html.unescape itself, so this table cannot drift from the oracle.
_ENTITIES: dict[str, str] = {
    "lt": "<", "LT": "<", "gt": ">", "GT": ">", "quot": '"', "QUOT": '"',
    "apos": "'", "nbsp": "\xa0", "copy": "\xa9", "COPY": "\xa9",
    "reg": "\xae", "REG": "\xae", "trade": "™", "TRADE": "™",
    "deg": "\xb0", "middot": "\xb7", "bull": "•", "sect": "\xa7",
    "para": "\xb6", "laquo": "\xab", "raquo": "\xbb", "mdash": "—",
    "ndash": "–", "hellip": "…", "lsquo": "‘",
    "rsquo": "’", "ldquo": "“", "rdquo": "”",
    "times": "\xd7", "divide": "\xf7", "plusmn": "\xb1", "euro": "€",
    "pound": "\xa3", "yen": "\xa5", "cent": "\xa2", "eacute": "\xe9",
    "egrave": "\xe8", "agrave": "\xe0", "ccedil": "\xe7", "auml": "\xe4",
    "ouml": "\xf6", "uuml": "\xfc", "szlig": "\xdf", "ntilde": "\xf1",
}
_NUMERIC: dict[str, str] = {
    "#34": '"', "#x22": '"', "#39": "'", "#x27": "'", "#X27": "'",
    "#60": "<", "#x3c": "<", "#62": ">", "#x3e": ">",
    "#160": "\xa0", "#xa0": "\xa0", "#32": " ", "#x20": " ",
    "#9": "\t", "#10": "\n", "#13": "\r",
    "#8211": "–", "#8212": "—", "#8216": "‘",
    "#8217": "’", "#8220": "“", "#8221": "”",
    "#8230": "…", "#169": "\xa9", "#174": "\xae", "#176": "\xb0",
    "#215": "\xd7", "#8364": "€",
}
# '&'-producers, replaced with a NUL sentinel until the very end.
_AMP_FORMS = ("amp", "AMP", "#38", "#x26", "#X26")
_SENTINEL = "\x00"

# All supported literal bodies (between '&' and ';') for the guard lookahead.
_SUPPORTED_BODIES = sorted(
    list(_ENTITIES) + list(_NUMERIC) + list(_AMP_FORMS), key=len, reverse=True
)
# Flag any NUL, and any '&' that starts a potential charref (Python only ever
# rewrites '&' followed by '#' or an ASCII letter) not matching a supported
# literal exactly. Conservative: unknown names Python leaves alone still fall
# back — slower, never wrong.
_J_GUARD = (
    "\\x00|&(?!(?:"
    + "|".join(b.replace("#", "\\#") for b in _SUPPORTED_BODIES)
    + ");)[#A-Za-z]"
)
# Raw-side guard: any complete tag containing a non-ASCII char. Python's
# (?i) case-folds Unicode into ASCII tag names in places Java's (?iu)
# does not (deep-fuzz counterexample: '</ſcript>' closes '<script>'
# under Python's fold-aware backreference but not under Java's) — every
# such row is conservatively oracle-routed. Tags in real/corpus HTML are
# ASCII; only pages with non-ASCII inside <...> take the slow path.
_J_GUARD_RAW = "(?s)<[^>]*[^\\x00-\\x7F][^>]*>"


def _native_pre(decoded):
    """Steps 1–5 (tag stripping) as one JVM expression over a string col."""
    from pyspark.sql import functions as F

    s = F.regexp_replace(decoded, _J_DROP, " ")
    s = F.regexp_replace(s, _J_COMMENT, " ")
    s = F.regexp_replace(s, _J_DOCTYPE, " ")
    s = F.regexp_replace(s, _J_BLOCK, "\n")
    s = F.regexp_replace(s, _J_TAG, " ")
    return s


def _native_post(pre):
    """Entities + whitespace normalization over the tag-stripped string."""
    from pyspark.sql import functions as F

    s = pre
    for body, ch in _ENTITIES.items():
        s = F.replace(s, F.lit("&" + body + ";"), F.lit(ch))
    for body, ch in _NUMERIC.items():
        s = F.replace(s, F.lit("&" + body + ";"), F.lit(ch))
    # '&'-producers → sentinel → '&' at the end: keeps single-pass semantics
    # ('&amp;lt;' → '\x00lt;' → ... → '&lt;', matching html.unescape).
    for body in _AMP_FORMS:
        s = F.replace(s, F.lit("&" + body + ";"), F.lit(_SENTINEL))
    s = F.replace(s, F.lit(_SENTINEL), F.lit("&"))
    # Whitespace normalization (mirrors _collapse_ws + per-line strip/join).
    s = F.translate(s, "\t\r\f\x0b", "    ")
    s = F.regexp_replace(s, " {2,}", " ")
    s = F.regexp_replace(s, "(?md)^[" + _PYWS_NONL + "]+|[" + _PYWS_NONL + "]+$", "")
    s = F.regexp_replace(s, "\n{2,}", "\n")
    s = F.regexp_replace(s, "(?d)^\\n|\\n$", "")
    return s


def extract_text_native(bin_col):
    """The pure-JVM chain (no guard). Byte-identical to ``extract_text`` on
    the supported domain; used directly only by tests/benchmarks."""
    return _native_post(_native_pre(bin_col.cast("string")))


def extract_guard(bin_col):
    """True where the row must take the Python-oracle path."""
    from pyspark.sql import functions as F

    decoded = bin_col.cast("string")
    return (
        (~F.is_valid_utf8(decoded))
        | F.regexp_like(decoded, F.lit(_J_GUARD_RAW))
        | F.regexp_like(_native_pre(decoded), F.lit(_J_GUARD))
    )


def extract_text_column(bin_col, mode: str = "auto"):
    """html binary → extracted text as a single Column.

    mode='auto' (default): JVM-native chain with per-row oracle fallback —
    the guard masks the pandas_udf input to NULL for fast-path rows, so the
    Arrow transfer carries only the (normally zero) flagged rows.
    mode='python': the round-1..4 pure-Python Arrow path (oracle everywhere).
    mode='native': guard-less JVM chain (bench experiments only).
    """
    from pyspark.sql import functions as F

    if mode == "python":
        return extract_text_udf()(bin_col)
    if mode == "native":
        return extract_text_native(bin_col)
    if mode != "auto":
        raise ValueError(f"extract mode must be auto|python|native, got {mode!r}")
    decoded = bin_col.cast("string")
    pre = _native_pre(decoded)
    guard = (
        (~F.is_valid_utf8(decoded))
        | F.regexp_like(decoded, F.lit(_J_GUARD_RAW))
        | F.regexp_like(pre, F.lit(_J_GUARD))
    )
    oracle = extract_text_udf()(F.when(guard, bin_col))
    return F.when(bin_col.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(oracle, _native_post(pre))
    )
