"""EDN codec.

Reference counterpart: logstash-codec-edn / logstash-codec-edn_lines
(lib/logstash/codecs/edn.rb) — each EDN form decodes into the event
map; decode failures keep the raw payload in ``message`` and tag
``_ednparsefailure``.

Spark re-expression, msgpack/protobuf precedent: a complete
**pure-Python reader of the public EDN spec** (edn-format.org — nil/
booleans, strings with escapes, characters, integers (``N`` suffix),
floats (``M`` suffix), keywords, symbols, lists/vectors/sets/maps,
``#_`` discard, ``;`` comments, ``#inst``/``#uuid``/generic tagged
literals) — no wheel needed. Each decoded form is emitted as one
canonical-JSON ``message`` string (json-codec layering: apply the json
filter downstream for schema). Keywords and symbols decode to their
name string WITHOUT the leading colon — the same flattening the
reference performs (Ruby ``Symbol#to_s``) when the EDN map becomes an
event. Sets keep source order (JSON has no set type; documented).
A file may hold one form or a concatenated/whitespace-separated stream
(the edn_lines shape). Corrupt payloads yield an error row with the
failure tag, never a task abort.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

EDN_SCHEMA = "message string, tags array<string>"
FAILURE_TAG = "_ednparsefailure"

_WS = set(" \t\r\n,")
# chars that terminate a symbol/keyword/number token
_DELIM = _WS | set('()[]{}"#;')

_NAMED_CHARS = {
    "newline": "\n", "return": "\r", "space": " ", "tab": "\t",
    "backspace": "\b", "formfeed": "\f",
}

_STR_ESC = {'"': '"', "\\": "\\", "n": "\n", "t": "\t", "r": "\r",
            "b": "\b", "f": "\f", "0": "\0"}


class EdnError(ValueError):
    pass


def _skip_ws(s: str, pos: int) -> int:
    n = len(s)
    while pos < n:
        c = s[pos]
        if c in _WS:
            pos += 1
        elif c == ";":  # comment to end of line
            while pos < n and s[pos] != "\n":
                pos += 1
        else:
            break
    return pos


def _read_token(s: str, pos: int) -> tuple[str, int]:
    start = pos
    n = len(s)
    while pos < n and s[pos] not in _DELIM:
        pos += 1
    if pos == start:
        raise EdnError(f"empty token at {pos}")
    return s[start:pos], pos


def _parse_number(tok: str):
    t = tok
    if t.endswith("N"):  # arbitrary-precision int suffix
        return int(t[:-1])
    if t.endswith("M"):  # exact-decimal suffix
        return float(t[:-1])
    if any(c in t for c in ".eE") and not t.lstrip("+-").startswith(("x", "X")):
        return float(t)
    return int(t)


def _read_string(s: str, pos: int) -> tuple[str, int]:
    out = []
    n = len(s)
    while pos < n:
        c = s[pos]
        if c == '"':
            return "".join(out), pos + 1
        if c == "\\":
            pos += 1
            if pos >= n:
                break
            e = s[pos]
            if e == "u":
                if pos + 4 >= n:
                    raise EdnError("truncated \\u escape")
                try:
                    out.append(chr(int(s[pos + 1:pos + 5], 16)))
                except ValueError as err:
                    raise EdnError(
                        f"bad \\u escape {s[pos + 1:pos + 5]!r}") from err
                pos += 5
                continue
            out.append(_STR_ESC.get(e, e))
            pos += 1
            continue
        out.append(c)
        pos += 1
    raise EdnError("unterminated string")


def _read_char(s: str, pos: int) -> tuple[str, int]:
    # \c, \newline, \uXXXX — token runs to the next delimiter
    start = pos
    n = len(s)
    pos += 1  # the char itself is never a delimiter check on first char
    while pos < n and s[pos] not in _DELIM:
        pos += 1
    tok = s[start:pos]
    if len(tok) == 1:
        return tok, pos
    if tok in _NAMED_CHARS:
        return _NAMED_CHARS[tok], pos
    if tok.startswith("u") and len(tok) == 5:
        try:
            return chr(int(tok[1:], 16)), pos
        except ValueError:
            pass
    raise EdnError(f"bad character literal \\{tok}")


def _read_seq(s: str, pos: int, closer: str) -> tuple[list, int]:
    out = []
    while True:
        pos = _skip_ws(s, pos)
        if pos >= len(s):
            raise EdnError(f"unterminated sequence (expected {closer})")
        if s[pos] == closer:
            return out, pos + 1
        v, pos = read_form(s, pos)
        if v is not _DISCARDED:
            out.append(v)


_DISCARDED = object()  # sentinel for #_ discard


def _key(k) -> str:
    return k if isinstance(k, str) else json.dumps(k, sort_keys=True)


def read_form(s: str, pos: int):
    """One EDN form at ``pos`` (ws already skipped) → (value, new_pos)."""
    if pos >= len(s):
        # a trailing `#_` / `#tag` leaves us expecting one more form
        raise EdnError("unexpected EOF (form expected)")
    c = s[pos]
    if c == '"':
        return _read_string(s, pos + 1)
    if c == "\\":
        return _read_char(s, pos + 1)
    if c == "(":
        return _read_seq(s, pos + 1, ")")
    if c == "[":
        return _read_seq(s, pos + 1, "]")
    if c == "{":
        items, pos = _read_seq(s, pos + 1, "}")
        if len(items) % 2:
            raise EdnError("map literal with odd number of forms")
        return {_key(items[i]): items[i + 1]
                for i in range(0, len(items), 2)}, pos
    if c == "#":
        if pos + 1 < len(s) and s[pos + 1] == "{":  # set
            items, pos = _read_seq(s, pos + 2, "}")
            return items, pos
        if pos + 1 < len(s) and s[pos + 1] == "_":  # discard next form
            # stacked discards (`#_ #_ a b`) discard one VALUE each: if
            # the following form is itself a discard, keep reading until
            # an actual value has been consumed (edn-format.org)
            pos = _skip_ws(s, pos + 2)
            v, pos = read_form(s, pos)
            while v is _DISCARDED:
                pos = _skip_ws(s, pos)
                v, pos = read_form(s, pos)
            return _DISCARDED, pos
        if pos + 1 < len(s) and s[pos + 1] == "#":  # ## symbolic value
            tok, pos = _read_token(s, pos + 2)
            sym = {"Inf": float("inf"), "-Inf": float("-inf"),
                   "NaN": float("nan")}.get(tok)
            if sym is None:
                raise EdnError(f"unknown symbolic value ##{tok}")
            return sym, pos
        tag, pos = _read_token(s, pos + 1)
        pos = _skip_ws(s, pos)
        val, pos = read_form(s, pos)
        if tag in ("inst", "uuid"):
            return val, pos  # ISO-8601 / uuid strings stand alone
        return {"__tag__": tag, "value": val}, pos
    if c == ":":
        tok, pos = _read_token(s, pos + 1)
        return tok, pos  # keyword → name (Ruby Symbol#to_s flattening)
    if c.isdigit() or (c in "+-" and pos + 1 < len(s) and s[pos + 1].isdigit()):
        tok, pos = _read_token(s, pos)
        try:
            return _parse_number(tok), pos
        except ValueError as e:
            raise EdnError(f"bad number {tok!r}") from e
    tok, pos = _read_token(s, pos)
    if tok == "nil":
        return None, pos
    if tok == "true":
        return True, pos
    if tok == "false":
        return False, pos
    return tok, pos  # symbol → its name string


def read_stream(s: str) -> list:
    """All concatenated/whitespace-separated top-level forms."""
    out, pos = [], 0
    while True:
        pos = _skip_ws(s, pos)
        if pos >= len(s):
            return out
        v, pos = read_form(s, pos)
        if v is not _DISCARDED:
            out.append(v)


def read_edn(spark, path: str, streaming: bool = False):
    """binaryFile → mapInPandas: each top-level EDN form becomes one
    event with its canonical-JSON rendering in ``message``; decode
    failures keep the raw text + ``_ednparsefailure``."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["content"]:
                text = bytes(raw).decode("utf-8", errors="replace")
                try:
                    for obj in read_stream(text):
                        rows.append((json.dumps(obj, sort_keys=True), None))
                except Exception as e:
                    # EdnError for diagnosed syntax; anything else a
                    # corrupt payload provokes (RecursionError on deep
                    # nesting, …) must also become an error row — the
                    # module contract is "never a task abort"
                    rows.append((text, [FAILURE_TAG, str(e)[:120]]))
            yield pd.DataFrame(rows, columns=["message", "tags"])

    from .binfile import binary_content

    return binary_content(spark, path, streaming).mapInPandas(_decode, schema=EDN_SCHEMA)
