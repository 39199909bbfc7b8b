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

from ..fieldref import TAGS_FIELD, field_col, field_name, sprintf_col

STAGE_REGISTRY: dict[str, type["Stage"]] = {}


def register(name: str):
    def deco(cls):
        STAGE_REGISTRY[name] = cls
        cls.plugin_name = name
        return cls

    return deco


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
                dotted = ".".join(parts[1:])
                if name in out.columns:
                    if not dict(out.dtypes)[name].startswith("struct"):
                        raise ValueError(
                            f"add_field: {ref!r} targets a nested key "
                            f"but column {name!r} is not a struct")
                    new = F.col(name).withField(dotted, val)
                    out = out.withColumn(
                        name, F.when(cond, new).otherwise(F.col(name)))
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
                if not dict(out.dtypes)[name].startswith("struct"):
                    continue  # non-struct top → nested key cannot exist
                dropped = F.col(name).dropFields(".".join(parts[1:]))
                out = out.withColumn(
                    name,
                    dropped if matched is None
                    else F.when(cond, dropped).otherwise(F.col(name)))
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
