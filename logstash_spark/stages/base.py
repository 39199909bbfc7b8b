"""Stage framework: one Logstash filter ≙ one plan-time DataFrame rewrite.

Reference counterpart: logstash-core/lib/logstash/filters/base.rb —
every filter shares the common options ``add_field``, ``add_tag``,
``remove_field``, ``remove_tag`` (applied via ``filter_matched`` ONLY
on events the filter matched) plus an ``id``. The per-event
``filter(event)`` contract becomes here a per-DataFrame ``transform``
contract: a stage takes a DataFrame and returns
``(DataFrame, matched_predicate | None)``; the base class then applies
the common options as ``F.when(matched, …)`` column rewrites — the
uniform success-conditioned wrapper SURVEY §2.4 requires.

Stages are registered by their Logstash plugin name so a pipeline spec
reads like a logstash.conf: ``{"grok": {...}}``, ``{"mutate": {...}}``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

from ..fieldref import (
    TAGS_FIELD, field_col, field_name, is_index, sprintf_col,
)

STAGE_REGISTRY: dict[str, type["Stage"]] = {}


def register(name: str):
    def deco(cls):
        STAGE_REGISTRY[name] = cls
        cls.plugin_name = name
        return cls

    return deco


def _qseg(seg: str) -> str:
    """Quote one struct-path segment for withField/dropFields, which
    PARSE dotted strings as nested paths — a field literally named
    ``b.c`` (de_dot exists because these occur in the wild) must be
    backtick-escaped or it silently addresses the wrong slot."""
    if "." in seg or "`" in seg:
        return "`" + seg.replace("`", "``") + "`"
    return seg


def _set_struct_path(col: Column, dtype, path: list[str], val: Column) -> Column:
    """Set ``path`` inside struct column ``col`` (whose schema is
    ``dtype``) to ``val``, creating missing intermediate structs the way
    the reference's ``Event#setField`` creates intermediate hashes
    (logstash-core: ConvertedMap auto-vivification), and — like Ruby —
    overwriting a non-hash intermediate with a hash."""
    from pyspark.sql.types import StructType

    prefix: list[str] = []
    cur = dtype
    for p in path[:-1]:
        if isinstance(cur, StructType) and p in cur.fieldNames():
            inner_t = cur[p].dataType
            if isinstance(inner_t, StructType):
                prefix.append(p)
                cur = inner_t
                continue
        break
    remainder = path[len(prefix):]
    inner = val
    for p in reversed(remainder[1:]):
        inner = F.struct(inner.alias(p))
    return col.withField(
        ".".join(_qseg(p) for p in prefix + [remainder[0]]), inner)


def _struct_path_value(dtype, name: str, path: list[str]) -> Column:
    """The current value at ``path`` inside struct column ``name`` cast
    to string (sprintf leaf type), or a null string when the path does
    not fully exist in the schema — used as the type-matched otherwise
    branch of a conditional nested add_field."""
    cur = dtype
    for p in path:
        if not (isinstance(cur, StructType) and p in cur.fieldNames()):
            return F.lit(None).cast("string")
        cur = cur[p].dataType
    expr = F.col(name)
    for p in path:
        expr = expr.getField(p)
    return expr.cast("string")


def _struct_leaf_type(dtype, path: list[str]):
    """The DataType at ``path`` inside struct schema ``dtype``, or None
    when the path does not fully exist."""
    from pyspark.sql.types import StructType

    cur = dtype
    for p in path:
        if not (isinstance(cur, StructType) and p in cur.fieldNames()):
            return None
        cur = cur[p].dataType
    return cur


def _existing_nonstruct_intermediate(dtype, path: list[str]) -> str | None:
    """First intermediate segment of ``path`` that EXISTS in ``dtype``
    with a non-struct type (so a write through it would overwrite a
    real value with a vivified struct), or None when every existing
    intermediate is a struct. Missing segments are fine — vivification
    creates them without destroying anything."""
    cur = dtype
    for p in path[:-1]:
        if not isinstance(cur, StructType):
            return None  # parent already non-struct: caught one level up
        if p not in cur.fieldNames():
            return None  # missing → vivify, nothing to destroy
        cur = cur[p].dataType
        if not isinstance(cur, StructType):
            return p
    return None


def _map_drop_key(col: Column, key: str) -> Column:
    """Remove ``key`` from a map column (per-key absence — the one
    thing maps can express that structs cannot)."""
    return F.map_filter(col, lambda k, _: k != F.lit(key))


def _map_set_key(
    col: Column, dtype, key: str, val: Column,
    only_if_present: bool = False,
) -> Column:
    """Upsert ``key`` in a map column (last-wins without depending on
    spark.sql.mapKeyDedupPolicy): filter the key out, concat the new
    entry. A null map becomes a one-entry map (Event#setField vivifies
    @metadata on first write). ``only_if_present`` keeps rows whose map
    does NOT already contain ``key`` untouched — the ``Event#include?``
    per-row gate of update/gsub/case ops, which must not fabricate a
    ``key -> null`` entry for rows the reference would skip."""
    base = F.coalesce(col, F.create_map().cast(dtype.simpleString()))
    entry = F.create_map(
        F.lit(key).cast(dtype.keyType), val.try_cast(dtype.valueType))
    upserted = F.map_concat(_map_drop_key(base, key), entry)
    if only_if_present:
        return F.when(
            F.map_contains_key(col, F.lit(key)), upserted).otherwise(col)
    return upserted


def _drop_field_path(df: DataFrame, parts: list[str]) -> DataFrame:
    """Drop the leaf at ``parts`` and collapse any ancestor struct the
    removal would leave EMPTY. Documented deviation: Ruby's Hash#delete
    leaves an empty ``{}`` behind, but Spark cannot represent an empty
    struct (dropFields errors on dropping the last field), so the
    emptied ancestor chain collapses instead. A map-typed top column
    (``[@metadata][k]``) removes the KEY via map_filter — maps, unlike
    structs, can express per-key absence directly."""
    top_t = df.schema[parts[0]].dataType
    if isinstance(top_t, MapType) and len(parts) == 2:
        return df.withColumn(
            parts[0], _map_drop_key(F.col(parts[0]), parts[1]))
    sizes = []
    cur = top_t
    for p in parts[1:]:
        if not isinstance(cur, StructType):
            raise ValueError(
                "cannot remove nested field "
                f"[{']['.join(parts)}]: intermediate is "
                f"{cur.simpleString()}, not a struct")
        sizes.append(len(cur.fields))
        cur = cur[p].dataType
    k = None
    for i in range(len(sizes) - 1, -1, -1):
        if sizes[i] > 1:
            k = i
            break
    if k is None:
        return df.drop(parts[0])
    dotted = ".".join(_qseg(p) for p in parts[1: k + 2])
    return df.withColumn(parts[0], F.col(parts[0]).dropFields(dotted))


def set_field(
    df: DataFrame, ref: str, val: Column,
    only_if_present: bool = False,
) -> DataFrame:
    """Write ``val`` at field reference ``ref`` — the plan-time
    equivalent of the reference's ``Event#setField``. Top-level ref →
    ``withColumn``; nested ref → set ONE key inside the struct
    (siblings survive), auto-vivifying missing intermediate structs
    and — like Ruby — overwriting a non-hash top/intermediate with a
    hash. List-index writes (digit path segments) are rejected loudly:
    a typed column cannot grow a per-row list slot.

    ``only_if_present`` (map-key targets only): skip rows whose map
    lacks the key — the per-row half of the ``Event#include?`` gate
    that ops like update/gsub apply schema-statically via
    ``field_exists``. Struct/top-level targets ignore the flag (their
    existence IS schema-static, already gated by the caller)."""
    from ..fieldref import _canonical, parse_ref

    parts = _canonical(parse_ref(ref))
    name = parts[0]
    if len(parts) == 1:
        return df.withColumn(name, val)
    if any(is_index(p) for p in parts[1:]):
        raise ValueError(
            f"set into a list index is not supported: {ref!r}")
    if name in df.columns:
        top_t = df.schema[name].dataType
        if isinstance(top_t, MapType):
            # map-typed top (canonically [@metadata] → the _meta map):
            # upsert the KEY — clobbering the whole map with a struct
            # would destroy every other entry AND retype the column
            # out from under later %{[@metadata][...]} reads
            if len(parts) != 2:
                raise ValueError(
                    f"set {ref!r}: column {name!r} is a map of "
                    f"{top_t.valueType.simpleString()} values — only "
                    "single-level key writes are supported")
            # refuse a silently-lossy value coercion: storing a
            # complex value (split's array, a parsed struct) into an
            # atomic map valueType would round-trip through a string
            # rendering / null via try_cast (review finding). Resolve
            # the expression's type at plan time and fail loudly.
            val_t = df.select(val.alias("__v")).schema[0].dataType
            if (isinstance(val_t, (ArrayType, MapType, StructType))
                    and not isinstance(top_t.valueType, type(val_t))):
                raise ValueError(
                    f"set {ref!r}: cannot store a "
                    f"{val_t.simpleString()} value in map values of "
                    f"type {top_t.valueType.simpleString()} — the "
                    "typed map cannot hold it; use a struct column or "
                    "a string rendering explicitly")
            return df.withColumn(name, _map_set_key(
                F.col(name), top_t, parts[1], val,
                only_if_present=only_if_present))
        if dict(df.dtypes)[name].startswith("struct"):
            return df.withColumn(name, _set_struct_path(
                F.col(name), top_t, parts[1:], val))
    inner = val
    for p in reversed(parts[1:]):
        inner = F.struct(inner.alias(p))
    return df.withColumn(name, inner)


def field_exists(df: DataFrame, ref: str) -> bool:
    """Does ``ref`` resolve to an existing column / struct leaf in the
    schema? (reference ``Event#include?`` at plan time — used for the
    'skip when field missing' discipline of update/convert/coerce)."""
    from ..fieldref import _canonical, parse_ref

    parts = _canonical(parse_ref(ref))
    if parts[0] not in df.columns:
        return False
    if len(parts) == 1:
        return True
    if any(is_index(p) for p in parts[1:]):
        # list index: existence is per-row, not schema-static — treat
        # the path as present iff the array column resolves
        return True
    top_t = df.schema[parts[0]].dataType
    if isinstance(top_t, MapType):
        # map keys are per-row, not schema-static: treat single-level
        # key refs as present (getField yields null for absent keys and
        # every op's null discipline handles that per row)
        return len(parts) == 2
    return _struct_leaf_type(top_t, parts[1:]) is not None


def ensure_tags(df: DataFrame) -> DataFrame:
    """Guarantee the tags array<string> column exists (reference events
    get ``tags`` lazily on first ``Event#tag``)."""
    if TAGS_FIELD in df.columns:
        return df
    return df.withColumn(TAGS_FIELD, F.array().cast("array<string>"))


def _tag_col(t: str) -> Column:
    """filters/base.rb sprintf-interpolates tag values before tagging
    (``event.tag(event.sprintf(tag))``) — ``add_tag => ["%{type}_ok"]``
    must tag 'apache_ok', not the literal template."""
    if "%{" in t:
        from ..fieldref import sprintf_col

        return sprintf_col(t)
    return F.lit(t)


def add_tags(df: DataFrame, tags: list[str], cond: Column | None = None) -> DataFrame:
    if not tags:
        return df
    df = ensure_tags(df)
    merged = F.array_union(
        F.coalesce(F.col(TAGS_FIELD), F.array().cast("array<string>")),
        F.array(*[_tag_col(t) for t in tags]),
    )
    col = merged if cond is None else F.when(cond, merged).otherwise(F.col(TAGS_FIELD))
    return df.withColumn(TAGS_FIELD, col)


class Stage:
    """Base class. Subclasses implement ``transform``."""

    plugin_name = "stage"

    def __init__(self, conf: dict):
        self.conf = dict(conf)
        self.id = self.conf.pop("id", None) or self.plugin_name
        self.add_field: dict[str, str] = self.conf.pop("add_field", {}) or {}
        self.add_tag: list[str] = self.conf.pop("add_tag", []) or []
        self.remove_field: list[str] = self.conf.pop("remove_field", []) or []
        self.remove_tag: list[str] = self.conf.pop("remove_tag", []) or []

    # ---- subclass contract -------------------------------------------------
    def transform(self, df: DataFrame) -> tuple[DataFrame, Column | None]:
        raise NotImplementedError

    def _targets(self, df: DataFrame) -> list[str] | None:
        """Columns this stage writes (new or overwritten), or None when
        not statically expressible — None forces the conditional
        compiler onto the persist+filter/union fallback. Stages whose
        output depends on OTHER rows (windows, groupBys, explodes) MUST
        return None: merging a full-df computation into a conditional
        would change their semantics, not just their cost."""
        return None

    def conditional_targets(self, df: DataFrame) -> list[str] | None:
        """Full write-set under an LSCL ``if`` wrapper: the stage's own
        targets plus the common-option targets (add_field/add_tag/
        remove_field/remove_tag land on columns too). Used by
        Pipeline.compile to lower ``if cond { stage }`` into
        when/otherwise column merges on the SINGLE DataFrame — the
        reference's Dataset#compute memoization equivalent (without it
        the upstream subtree executes once per conditional branch)."""
        own = self._targets(df)
        if own is None:
            return None
        extra = [field_name(r) for r in self.add_field]
        extra += [field_name(r) for r in self.remove_field]
        if self.add_tag or self.remove_tag:
            extra.append(TAGS_FIELD)
        return list(dict.fromkeys(list(own) + extra))

    # ---- common-option wrapper (filters/base.rb filter_matched) ------------
    def apply(self, df: DataFrame) -> DataFrame:
        out, matched = self.transform(df)
        if not (self.add_field or self.add_tag or self.remove_field or self.remove_tag):
            return out.drop("__matched") if "__matched" in out.columns else out
        from ..fieldref import _canonical, parse_ref

        cond = matched if matched is not None else F.lit(True)
        for ref, template in self.add_field.items():
            parts = _canonical(parse_ref(ref))
            name = parts[0]
            val = sprintf_col(template)
            if len(parts) > 1:
                # nested target: set ONE key inside the struct — a
                # whole-column write would clobber the siblings and
                # retype the column (the reference sets only [a][b])
                if name in out.columns:
                    top_t = out.schema[name].dataType
                    if isinstance(top_t, MapType):
                        # map top ([@metadata][k]): key upsert — both
                        # CASE branches are the same map type, so the
                        # conditional form needs no alignment tricks
                        if len(parts) != 2:
                            raise ValueError(
                                f"add_field: {ref!r} targets a key "
                                f"inside map values of column {name!r}"
                                " — only single-level key writes are "
                                "supported")
                        new = _map_set_key(F.col(name), top_t, parts[1], val)
                        out = out.withColumn(
                            name, new if matched is None else
                            F.when(cond, new).otherwise(F.col(name)))
                        continue
                    if not dict(out.dtypes)[name].startswith("struct"):
                        if matched is None:
                            # unconditional: event.set parity — Ruby
                            # overwrites a non-hash top with a hash,
                            # exactly like set_field/replace do
                            out = set_field(out, ref, val)
                            continue
                        raise ValueError(
                            f"add_field: {ref!r} targets a nested key "
                            f"but column {name!r} is not a struct — a "
                            "conditional write cannot retype it "
                            "without clobbering unmatched rows")
                    dtype = out.schema[name].dataType
                    if matched is not None:
                        # an existing COMPLEX leaf cannot survive the
                        # conditional rewrite: the otherwise branch
                        # must carry the new (string) leaf type, which
                        # would stringify unmatched rows' struct/array/
                        # map values (review finding) — refuse loudly
                        leaf_t = _struct_leaf_type(dtype, parts[1:])
                        if isinstance(leaf_t, (ArrayType, MapType,
                                               StructType)):
                            raise ValueError(
                                f"add_field: {ref!r} overwrites an "
                                f"existing {leaf_t.simpleString()} "
                                "leaf under a conditional — unmatched "
                                "rows cannot keep the complex value "
                                "in the retyped column; remove the "
                                "field first or write unconditionally")
                        # a conditional write THROUGH an existing
                        # non-struct intermediate would have to vivify
                        # it into a struct on every row — destroying
                        # the original value on rows the filter did NOT
                        # match (the reference leaves unmatched events
                        # untouched). A typed column cannot hold both
                        # shapes; refuse loudly instead of corrupting.
                        bad = _existing_nonstruct_intermediate(
                            dtype, parts[1:])
                        if bad is not None:
                            raise ValueError(
                                f"add_field: {ref!r} writes through "
                                f"[{bad}], which exists with a "
                                "non-struct type — a conditional write "
                                "cannot retype it without clobbering "
                                "unmatched rows; rename the "
                                "intermediate or write unconditionally")
                    new = _set_struct_path(F.col(name), dtype, parts[1:], val)
                    if matched is None:
                        # unconditional: assign directly — a
                        # when/otherwise over the original column is a
                        # CASE WHEN with mismatched struct types the
                        # moment the path adds a NEW key
                        out = out.withColumn(name, new)
                    else:
                        # conditional: the otherwise branch must carry
                        # the SAME struct type, so it sets the same
                        # path — to the pre-existing value (rendered as
                        # string, matching the sprintf leaf type) when
                        # the full path already exists, else to null
                        keep = _struct_path_value(dtype, name, parts[1:])
                        unset = _set_struct_path(
                            F.col(name), dtype, parts[1:], keep)
                        out = out.withColumn(
                            name, F.when(cond, new).otherwise(unset))
                else:
                    inner = val
                    for p in reversed(parts[1:]):
                        inner = F.struct(inner.alias(p))
                    out = out.withColumn(name, F.when(cond, inner))
            elif name in out.columns:
                out = out.withColumn(name, F.when(cond, val).otherwise(F.col(name)))
            else:
                out = out.withColumn(name, F.when(cond, val))
        if self.add_tag:
            out = add_tags(out, self.add_tag, cond)
        for ref in self.remove_field:
            parts = _canonical(parse_ref(ref))
            name = parts[0]
            if name not in out.columns:
                continue
            if len(parts) > 1:
                # nested removal: drop ONE key, keep the siblings
                top_t = out.schema[name].dataType
                if isinstance(top_t, MapType) and len(parts) == 2:
                    filtered = _map_drop_key(F.col(name), parts[1])
                    out = out.withColumn(
                        name, filtered if matched is None else
                        F.when(cond, filtered).otherwise(F.col(name)))
                    continue
                if not dict(out.dtypes)[name].startswith("struct"):
                    continue  # non-struct top → nested key cannot exist
                leaf_t = _struct_leaf_type(out.schema[name].dataType, parts[1:])
                if leaf_t is None:
                    continue  # path absent → reference no-op (dropFields
                    # on a missing field would fail analysis)
                dotted = ".".join(_qseg(p) for p in parts[1:])
                if matched is None:
                    # _drop_field_path collapses ancestors the removal
                    # would leave empty (dropFields errors on emptying
                    # a struct)
                    out = _drop_field_path(out, parts)
                else:
                    # conditional: a CASE over dropped-vs-original is two
                    # DIFFERENT struct types → analysis error. Null the
                    # leaf in place instead (typed schemas can't express
                    # per-row key absence; null is Spark's absent)
                    leaf = F.col(name)
                    for p in parts[1:]:
                        leaf = leaf.getField(p)
                    nulled = F.col(name).withField(
                        dotted,
                        F.when(cond, F.lit(None).cast(leaf_t)).otherwise(leaf))
                    out = out.withColumn(name, nulled)
            elif matched is None:
                out = out.drop(name)
            else:
                out = out.withColumn(
                    name, F.when(cond, F.lit(None).cast(dict(out.dtypes)[name])).otherwise(F.col(name))
                )
        if self.remove_tag:
            out = ensure_tags(out)
            removed = F.array_except(
                F.col(TAGS_FIELD),
                F.array(*[_tag_col(t) for t in self.remove_tag]))
            out = out.withColumn(
                TAGS_FIELD, F.when(cond, removed).otherwise(F.col(TAGS_FIELD))
            )
        if "__matched" in out.columns:
            out = out.drop("__matched")
        return out


def build_stage(spec: dict | tuple[str, dict]) -> Stage:
    """``{"grok": {...}}`` (single-key dict) or ``("grok", {...})`` → Stage."""
    if isinstance(spec, tuple):
        name, conf = spec
    else:
        if len(spec) != 1:
            raise ValueError(f"stage spec must have exactly one key: {spec}")
        name, conf = next(iter(spec.items()))
    if name not in STAGE_REGISTRY:
        raise ValueError(f"unknown stage {name!r}; known: {sorted(STAGE_REGISTRY)}")
    return STAGE_REGISTRY[name](conf or {})


# convenient functional alias used by tests
def apply_stage(df: DataFrame, spec: dict) -> DataFrame:
    return build_stage(spec).apply(df)


StageFn = Callable[[DataFrame], DataFrame]

__all__ = [
    "Stage",
    "STAGE_REGISTRY",
    "register",
    "build_stage",
    "apply_stage",
    "ensure_tags",
    "add_tags",
    "field_col",
    "field_name",
]
