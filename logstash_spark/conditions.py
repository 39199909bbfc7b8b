"""Logstash conditional expressions compiled to Catalyst predicates.

Reference counterparts:
* grammar — logstash-core/lib/logstash/compiler/lscl.rb + generated
  treetop grammar logstash-core/lib/logstash/config/grammar.rb
  (``Condition``, ``Expression`` rules);
* runtime — logstash-core/src/main/java/org/logstash/config/ir/compiler/
  EventCondition.java (``EventCondition.Compiler``: eq/compare/regex/
  in/truthy branches, expression-identity cache);
* IR nodes — org/logstash/config/ir/expression/binary/{Eq,Neq,Gt,Gte,
  Lt,Lte,RegexEq,In,And,Or}.java, unary/Not.java.

Spark mapping (SURVEY §2.1): each conditional compiles ONCE, at plan
time, to a native Column predicate — Catalyst codegen replaces the
reference's runtime-generated EventCondition classes. Supported
surface: ``== != < > <= >= =~ !~ in not in and or nand xor ! ()``,
bare-field truthiness, string/number/list/regex literals, nested field
refs. Compilation is cached by expression text (mirrors
EventCondition's CACHE).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .fieldref import field_col
from .fieldref import is_index as _is_index

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<field>(?:\[[^\[\]\"',]+\])+)          # [a][b] field ref
    | (?P<string>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")  # string (\" ok)
    | (?P<regex>/(?:\\.|[^/])*/)                # /regex/
    | (?P<number>-?\d+(?:\.\d+)?)               # number
    | (?P<op>==|!=|<=|>=|=~|!~|<|>)             # comparison ops
    | (?P<kw>\band\b|\bor\b|\bnand\b|\bxor\b|\bnot\ in\b|\bin\b|\btrue\b|\bfalse\b)
    | (?P<bang>!)
    | (?P<lparen>\()
    | (?P<rparen>\))
    | (?P<lbracket>\[)
    | (?P<rbracket>\])
    | (?P<comma>,)
    )
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str


def _false_if_null(c: Column) -> Column:
    """Ruby/EventCondition nil-discipline shim: a null predicate is
    plain FALSE before any negation — SQL's three-valued ~null stays
    null and the row would vanish from BOTH branches of an if/else."""
    return F.coalesce(c, F.lit(False))


def _tokenize(s: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"cannot tokenize condition at: {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        toks.append(_Tok(kind, m.group(kind)))
    return toks


class _Operand:
    """Parsed operand: a field ref, a literal, a list, or a regex."""

    def __init__(self, kind: str, value):
        self.kind = kind  # field | str | num | bool | list | regex
        self.value = value

    def col(self) -> Column:
        if self.kind == "field":
            return field_col(self.value)
        return F.lit(self.value)


class ConditionParser:
    """Recursive-descent parser. Binary boolean operators fold LEFT-
    ASSOCIATIVELY with NO precedence (the LSCL treetop grammar's
    ``expression (booleanOperator expression)*`` shape): ``a or b and
    c`` is ``(a or b) and c`` — conventional and-binds-tighter parsing
    would silently re-group ported configs. ``!`` binds tightest.

    Null discipline (EventCondition parity): the reference evaluates
    over Ruby/Java values where nil comparisons are plain false and
    negation of false is TRUE — three-valued SQL logic would instead
    swallow the row from BOTH branches of an if/else (null → filtered
    out of the then-branch AND of the ``!(...)`` else-branch). So every
    negating operator (! != !~ not-in nand) coalesces its operand to
    false before negating, and == lowers to the null-safe ``<=>``
    (nil == nil is true in Ruby, and Neq is its strict complement)."""

    def __init__(self, toks: list[_Tok], df: DataFrame | None):
        self.toks = toks
        self.i = 0
        self.df = df

    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def _ocol(self, o: _Operand) -> Column:
        """Operand → Column, lowering a field ref that does NOT resolve
        in the schema to nil (EventCondition parity: missing fields
        compare as nil and route to the else branch — resolving the
        column would instead fail analysis and kill the run; the class
        docstring's `[missing] != 'debug'` idiom depends on this).
        Without a schema (df=None) refs resolve optimistically as
        before."""
        if (o.kind == "field" and self.df is not None
                and self._dtype(o.value) is None):
            return F.lit(None)
        return o.col()

    def _dtype(self, ref: str) -> str | None:
        """Resolved LEAF type of a (possibly nested) field ref — the
        try_cast coercion guard and the truthiness lowering must see the
        type of ``[a][b]``'s leaf, not of the top-level struct, and the
        @timestamp/@metadata aliases must resolve through their
        canonical column names."""
        if self.df is None:
            return None
        from pyspark.sql import types as T

        from .fieldref import _canonical, parse_ref

        parts = _canonical(parse_ref(ref))
        cur = None
        for f in self.df.schema.fields:
            if f.name == parts[0]:
                cur = f.dataType
                break
        if cur is None:
            return None
        for p in parts[1:]:
            if isinstance(cur, T.StructType):
                sub = next((f for f in cur.fields if f.name == p), None)
                if sub is None:
                    return None
                cur = sub.dataType
            elif isinstance(cur, T.ArrayType) and _is_index(p):
                cur = cur.elementType
            elif isinstance(cur, T.MapType):
                cur = cur.valueType
            else:
                return None
        return cur.simpleString()

    # ---- grammar ----
    def parse(self) -> Column:
        c = self._bool_expr()
        if self._peek() is not None:
            raise ValueError(f"trailing tokens in condition at {self._peek().text!r}")
        return c

    def _bool_expr(self) -> Column:
        # flat LEFT-ASSOCIATIVE fold over and/or/nand/xor — the LSCL
        # grammar has no boolean precedence (see class docstring)
        left = self._unary()
        while (t := self._peek()) and t.kind == "kw" and t.text in (
                "and", "or", "nand", "xor"):
            op = self._next().text
            right = self._unary()
            if op == "and":
                left = left & right
            elif op == "or":
                left = left | right
            elif op == "nand":
                left = ~(_false_if_null(left) & _false_if_null(right))
            else:  # xor — on truthiness booleans, != (EventCondition)
                left = _false_if_null(left) != _false_if_null(right)
        return left

    def _unary(self) -> Column:
        t = self._peek()
        if t is None:
            raise ValueError("unexpected end of condition")
        if t.kind == "bang":
            self._next()
            # nil inner → false in the reference, so ! must yield TRUE —
            # three-valued ~null would drop the row from both branches
            return ~_false_if_null(self._unary())
        if t.kind == "lparen":
            self._next()
            inner = self._bool_expr()
            if not (self._peek() and self._peek().kind == "rparen"):
                raise ValueError("missing )")
            self._next()
            return inner
        return self._comparison()

    def _operand(self) -> _Operand:
        t = self._next()
        if t.kind == "field":
            return _Operand("field", t.text)
        if t.kind == "string":
            q = t.text[0]
            # grammar-level unescape: only the QUOTE char (\" / \') —
            # other backslashes stay verbatim (support_escapes=false
            # default, the same stance lscl.py takes for config strings)
            return _Operand("str", t.text[1:-1].replace("\\" + q, q))
        if t.kind == "number":
            v = float(t.text) if "." in t.text else int(t.text)
            return _Operand("num", v)
        if t.kind == "regex":
            return _Operand("regex", t.text[1:-1].replace("\\/", "/"))
        if t.kind == "kw" and t.text in ("true", "false"):
            return _Operand("bool", t.text == "true")
        if t.kind == "lbracket":  # list literal [ 'a', 'b' ]
            items = []
            while True:
                nxt = self._peek()
                if nxt is None:
                    raise ValueError("unterminated list literal")
                if nxt.kind == "rbracket":
                    self._next()
                    break
                if nxt.kind == "comma":
                    self._next()
                    continue
                items.append(self._operand().value)
            return _Operand("list", items)
        raise ValueError(f"unexpected token {t.text!r}")

    def _truthy(self, op: _Operand) -> Column:
        """Bare ``if [f]`` — EventCondition.Compiler#valueIsTruthy:
        null, the EMPTY STRING, and the string "false" (hence boolean
        false via toString) are falsy; everything else (including 0)
        is truthy."""
        col = self._ocol(op)
        if op.kind == "field":
            dt = self._dtype(op.value)
            if dt == "boolean":
                return col.isNotNull() & col
            if dt == "string":
                return (col.isNotNull() & (col != F.lit(""))
                        & (col != F.lit("false")))
            return col.isNotNull()
        return F.lit(bool(op.value))

    def _comparison(self) -> Column:
        left = self._operand()
        t = self._peek()
        if t is None or t.kind not in ("op", "kw") or (
            t.kind == "kw" and t.text not in ("in", "not in")
        ):
            return self._truthy(left)
        tok = self._next()
        if tok.kind == "kw":  # in / not in
            right = self._operand()
            result = self._in(left, right)
            # nil in [...] is false, so `not in` on a nil field is TRUE
            return ~_false_if_null(result) if tok.text == "not in" else result
        op = tok.text
        if op in ("=~", "!~"):
            right = self._operand()
            if right.kind not in ("regex", "str"):
                # the LSCL grammar only allows a string/regexp RHS; a
                # field ref here would silently use its ref TEXT as
                # the pattern (a character class) — reject like the
                # reference's config loader does
                raise ValueError(
                    f"{op} right operand must be a string or /regex/ "
                    f"literal, got {right.kind}")
            pat = right.value
            # Logstash =~ is a *search*, not a full match → rlike semantics match.
            matched = self._ocol(left).rlike(pat)
            # nil =~ /x/ is false, so nil !~ /x/ is TRUE (Ruby/RegexEq)
            return ~_false_if_null(matched) if op == "!~" else matched
        right = self._operand()
        lc, rc = self._ocol(left), self._ocol(right)
        # static numeric coercion: string field vs number literal.
        # try_cast: a non-numeric string compares as null (condition
        # false), never an ANSI throw — EventCondition's dynamic compare
        # likewise never aborts the pipeline.
        if left.kind == "field" and right.kind == "num" and self._dtype(left.value) == "string":
            lc = lc.try_cast("double")
        if right.kind == "field" and left.kind == "num" and self._dtype(right.value) == "string":
            rc = rc.try_cast("double")
        # == is Ruby ==: nil == x is FALSE (not null) and nil == nil is
        # TRUE → null-safe <=>; Neq is its strict complement, so
        # `[missing] != 'debug'` routes the event (the drop-debug idiom)
        return {
            "==": lambda: lc.eqNullSafe(rc),
            "!=": lambda: ~lc.eqNullSafe(rc),
            "<": lambda: lc < rc,
            ">": lambda: lc > rc,
            "<=": lambda: lc <= rc,
            ">=": lambda: lc >= rc,
        }[op]()

    def _in(self, left: _Operand, right: _Operand) -> Column:
        # value in list → isin; value in string-field → substring;
        # value in array-field → array_contains (EventCondition.Compiler#in).
        if right.kind == "list":
            return self._ocol(left).isin(*right.value)
        if right.kind == "field":
            dt = self._dtype(right.value) or ""
            if dt.startswith("array"):
                return F.array_contains(self._ocol(right), self._ocol(left))
            if dt.startswith("map"):
                # Ruby Hash#include? checks KEYS ('k' in [@metadata])
                return F.map_contains_key(
                    self._ocol(right), self._ocol(left))
            return self._ocol(right).contains(self._ocol(left))
        if right.kind == "str":
            return F.lit(right.value).contains(self._ocol(left))
        raise ValueError("unsupported 'in' right operand")


# Bounded LRU keyed by (expr, schema): long-lived sessions with
# evolving schemas would otherwise grow this without limit (round-1
# finding). 1024 entries ≈ hundreds of distinct pipeline configs.
_CACHE_MAX = 1024
_CACHE: dict[tuple[str, str | None], Column] = {}


def compile_condition(expr: str, df: DataFrame | None = None) -> Column:
    """Condition string → Column predicate (cached by expression text,
    mirroring EventCondition.Compiler's CACHE)."""
    key = (expr, str(df.schema) if df is not None else None)
    hit = _CACHE.pop(key, None)  # pop+reinsert = LRU order (dicts are ordered)
    if hit is None:
        hit = ConditionParser(_tokenize(expr), df).parse()
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = hit
    return hit
