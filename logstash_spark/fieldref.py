"""Field references and sprintf interpolation, compiled to Column exprs.

Reference counterparts:
* ``[a][b][c]`` nested field paths — logstash-core/src/main/java/org/
  logstash/FieldReference.java (``FieldReference#from``,
  ``StrictTokenizer``): parsed once, cached, strict about malformed refs.
* ``%{field}`` / ``%{[a][b]}`` / ``%{+yyyy.MM.dd}`` string templates —
  logstash-core/src/main/java/org/logstash/StringInterpolation.java
  (``StringInterpolation#evaluate``).

Spark mapping (SURVEY.md §1.2): a field ref becomes a dotted Column
path (struct access); ``@timestamp`` maps to the ``event_ts`` column;
``@metadata`` to the ``_meta`` map column; sprintf compiles ONCE at
plan time into a ``concat`` of literals, column refs and
``date_format(event_ts, fmt)`` — Catalyst constant-folds the rest.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TIMESTAMP_FIELD = "event_ts"
METADATA_FIELD = "_meta"
TAGS_FIELD = "tags"

_REF_TOKEN = re.compile(r"\[([^\[\]]+)\]")
_SPRINTF = re.compile(r"%\{([^}]+)\}")


class FieldRefError(ValueError):
    """Malformed field reference (mirrors FieldReference.StrictTokenizer)."""


def parse_ref(ref: str) -> list[str]:
    """``"[a][b]"`` → ``["a", "b"]``; bare ``"a"`` → ``["a"]``.

    Strict: a ref containing ``[`` must be fully bracketed with no
    stray characters (the reference rejects ambiguous refs the same way).
    """
    if not ref:
        raise FieldRefError("empty field reference")
    if "[" not in ref and "]" not in ref:
        return [ref]
    parts = _REF_TOKEN.findall(ref)
    if "".join(f"[{p}]" for p in parts) != ref:
        raise FieldRefError(f"malformed field reference: {ref!r}")
    return parts


def _canonical(parts: list[str]) -> list[str]:
    # Reserved-name mapping (SURVEY §1.2 table).
    if parts[0] == "@timestamp":
        return [TIMESTAMP_FIELD] + parts[1:]
    if parts[0] == "@metadata":
        return [METADATA_FIELD] + parts[1:]
    return parts


def field_col(ref: str) -> Column:
    """Field reference → Column. Nested path = struct/map access chain."""
    parts = _canonical(parse_ref(ref))
    col = F.col(parts[0])
    for p in parts[1:]:
        # numeric path element = 0-based list index (FieldReference
        # semantics). F.get, not getItem: out-of-bounds yields null
        # instead of an ANSI INVALID_ARRAY_INDEX throw.
        col = F.get(col, int(p)) if p.isdigit() else col.getField(p)
    return col


def field_name(ref: str) -> str:
    """Top-level column name for a ref (for withColumn targets)."""
    return _canonical(parse_ref(ref))[0]


def _joda_to_java(fmt: str) -> str:
    """Logstash date patterns are JODA; Spark's date_format/
    try_to_timestamp use java.time. The overlap is large but the
    differences are data-corrupting where they bite:

    * Joda ``Y`` = year-of-era (the ubiquitous ``%{+YYYY.MM.dd}`` index
      pattern), java.time ``Y`` = WEEK-BASED year → wrong year for a
      few days around every new year. Translate Y-runs → ``y``.
    * Joda ``x`` = weekyear → java.time ``Y``.
    * Joda zone tokens are LENGTH-MATCHED, not substring-replaced (a
      blind ``.replace('ZZ', 'XXX')`` mangles ``ZZZ`` into ``XXXZ``):
      ``Z`` (+0100) → ``Z`` (same in java.time), ``ZZ`` (+01:00) →
      ``xxx`` (never the bare 'Z' that java ``XXX`` emits at UTC —
      Joda ZZ prints +00:00), ``ZZZ``+ (zone id) → ``VV``.

    Quoted literals (``'T'``) pass through verbatim."""
    import re as _re

    def _z(m: "_re.Match") -> str:
        n = len(m.group())
        if n == 1:
            return "Z"
        if n == 2:
            return "xxx"
        return "VV"

    out = []
    for i, seg in enumerate(_re.split(r"('(?:[^']|'')*')", fmt)):
        if i % 2:  # quoted literal
            out.append(seg)
            continue
        seg = _re.sub(r"Y+", lambda m: "y" * len(m.group()), seg)
        seg = _re.sub(r"x+", lambda m: "Y" * len(m.group()), seg)
        out.append(_re.sub(r"Z+", _z, seg))
    return "".join(out)


def sprintf_col(template: str, ts_field: str = TIMESTAMP_FIELD) -> Column:
    """Compile a ``%{...}`` template into one concat Column.

    * ``%{field}`` / ``%{[a][b]}`` → the field's string value
      (null-safe: null prints as empty string, matching the reference's
      behavior of leaving ``%{missing}`` unresolved is NOT mirrored —
      we document empty-string for missing as a deviation).
    * ``%{+<fmt>}`` → ``date_format(event_ts, fmt)``.
    """
    pieces: list[Column] = []
    pos = 0
    for m in _SPRINTF.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos : m.start()]))
        token = m.group(1)
        if token.startswith("+"):
            pieces.append(F.date_format(F.col(ts_field), _joda_to_java(token[1:])))
        else:
            pieces.append(F.coalesce(field_col(token).cast("string"), F.lit("")))
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    if not pieces:
        return F.lit("")
    return pieces[0] if len(pieces) == 1 else F.concat(*pieces)
