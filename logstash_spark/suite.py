"""Driver-contract query suite: engine queries + DuckDB oracle SQL.

Every entry exercises one operator family from SURVEY.md §2 through the
REAL engine code path (stage classes / datapipe functions), over the
driver's parquet tables (region nation customer supplier part orders
lineitem events documents embeddings). For each query there is an
ANSI-SQL oracle that DuckDB runs on the same tables; the driver compares
row counts, schemas and order-insensitive value hashes.

Float discipline (so hashes match bit-for-bit):
* money/metrics sums are computed in integer cents/micros on BOTH sides
  (``round(x*100)::long`` / ``floor(x*1e6)::long``) — no FP-summation
  order dependence;
* ratios divide exact ints (identical IEEE doubles on both engines);
* cosine similarity replicates the engine's left-fold summation order
  in SQL (list_reduce with a prepended 0.0) and rounds to 6;
* query vectors use only binary-exact literals (1.0 / 0.5 / -0.25).

Queries with no SQL-expressible oracle (seeded LSH/IVF/minhash/simhash,
crc32-based fingerprints) are registered without an oracle entry — the
driver records a rows-only check for them, per the contract.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .conditions import compile_condition
from .datapipe.dedup import exact_dedup, minhash_dedup, ngram_jaccard_pairs, simhash_dedup
from .datapipe.similarity import ann_ivf_topk, ann_lsh_topk, cosine_topk
from .datapipe.textstats import (
    BPE_ISH_REGEX,
    EN_STOPWORDS,
    LANG_MARKERS,
    detect_language,
    quality_score,
    rolling_fingerprint,
    whitespace_token_count,
    bpe_ish_token_count,
)
from .stages.base import apply_stage, build_stage

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn: QueryFn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events_msg(spark, sf_dir, expr) -> DataFrame:
    return _t(spark, sf_dir, "events").withColumn("message", expr)


# ---------------------------------------------------------------------------
# Parse family (SURVEY §2.4: grok, dissect, kv, json, csv, date)
# ---------------------------------------------------------------------------

@_q(
    "grok_multi_capture",
    """
    SELECT event_id, event_type AS etype, CAST(user_id AS VARCHAR) AS uid
    FROM events
    """,
)
def grok_multi_capture(spark, sf_dir):
    """grok with a PATTERN LIST (first-match-wins) → the vectorized
    str.extract pandas-UDF path (single patterns lower to native JVM
    regexp_extract; the list keeps this query on the Python executor)."""
    ev = _events_msg(
        spark, sf_dir,
        F.concat(F.col("event_type"), F.lit(" id="), F.col("user_id").cast("string")),
    )
    out = apply_stage(
        ev,
        {"grok": {"match": {"message": [
            "%{WORD:etype} id=%{INT:uid} extra=%{INT:xtra}",  # never matches
            "%{WORD:etype} id=%{INT:uid}",
        ]}}},
    )
    return out.select("event_id", "etype", "uid")


@_q(
    "grok_single_native",
    "SELECT event_id, CAST(user_id AS VARCHAR) AS uid FROM events",
)
def grok_single_native(spark, sf_dir):
    """Single-capture grok lowers to native F.regexp_extract (JVM codegen)."""
    ev = _events_msg(
        spark, sf_dir, F.concat(F.lit("id="), F.col("user_id").cast("string"))
    )
    out = apply_stage(ev, {"grok": {"match": {"message": "id=%{INT:uid}"}}})
    return out.select("event_id", "uid")


@_q(
    "grok_typed_captures",
    "SELECT event_id, user_id AS uid, event_id AS nid FROM events",
)
def grok_typed_captures(spark, sf_dir):
    """grok %{INT:field:int} type conversions (grok.rb's third ref part)."""
    ev = _events_msg(
        spark, sf_dir,
        F.concat(F.lit("id="), F.col("user_id").cast("string"),
                 F.lit(" n="), F.col("event_id").cast("string")),
    )
    out = apply_stage(
        ev, {"grok": {"match": {"message": "id=%{INT:uid:int} n=%{INT:nid:int}"}}}
    )
    return out.select("event_id", "uid", "nid")


@_q(
    "dissect_tokens",
    """
    SELECT event_id, event_type AS etype, CAST(user_id AS VARCHAR) AS uid,
           CAST(event_id AS VARCHAR) AS eid
    FROM events
    """,
)
def dissect_tokens(spark, sf_dir):
    ev = _events_msg(
        spark, sf_dir,
        F.concat_ws(
            "|", F.col("event_type"), F.col("user_id").cast("string"),
            F.col("event_id").cast("string"),
        ),
    )
    out = apply_stage(ev, {"dissect": {"mapping": {"message": "%{etype}|%{uid}|%{eid}"}}})
    return out.select("event_id", "etype", "uid", "eid")


@_q(
    "kv_pairs",
    """
    SELECT event_id, event_type AS ktype, CAST(user_id AS VARCHAR) AS kuid
    FROM events
    """,
)
def kv_pairs(spark, sf_dir):
    ev = _events_msg(
        spark, sf_dir,
        F.concat(
            F.lit("type="), F.col("event_type"),
            F.lit(" uid="), F.col("user_id").cast("string"),
        ),
    )
    out = apply_stage(ev, {"kv": {"source": "message"}})
    return out.select(
        "event_id",
        F.col("attrs")["type"].alias("ktype"),
        F.col("attrs")["uid"].alias("kuid"),
    )


@_q(
    "json_parse",
    "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k FROM events",
)
def json_parse(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(ev, {"json": {"source": "props", "schema": "k int", "target": "pp"}})
    return out.select("event_id", F.col("pp.k").alias("k"))


@_q(
    "csv_parse",
    """
    SELECT event_id, event_type AS etype, user_id AS uid FROM events
    """,
)
def csv_parse(spark, sf_dir):
    ev = _events_msg(
        spark, sf_dir,
        F.concat_ws(",", F.col("event_type"), F.col("user_id").cast("string")),
    )
    out = apply_stage(
        ev,
        {"csv": {"source": "message", "columns": ["etype", "uid"],
                 "convert": {"uid": "long"}}},
    )
    return out.select("event_id", "etype", "uid")


@_q(
    "date_multiformat",
    """
    WITH d AS (
      SELECT event_id,
             CASE WHEN event_id % 2 = 0
                  THEN strftime(ts, '%Y/%m/%d %H:%M:%S')
                  ELSE strftime(ts, '%d-%m-%Y %H:%M:%S') END AS datestr
      FROM events
    )
    SELECT event_id,
           COALESCE(try_strptime(datestr, '%Y/%m/%d %H:%M:%S'),
                    try_strptime(datestr, '%d-%m-%Y %H:%M:%S')) AS event_ts
    FROM d
    """,
)
def date_multiformat(spark, sf_dir):
    """date filter: per-format fallback coalesce (date.rb semantics)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "datestr",
        F.when(
            F.pmod(F.col("event_id"), F.lit(2)) == 0,
            F.date_format("ts", "yyyy/MM/dd HH:mm:ss"),
        ).otherwise(F.date_format("ts", "dd-MM-yyyy HH:mm:ss")),
    )
    out = apply_stage(
        ev,
        {"date": {"match": ["datestr", "yyyy/MM/dd HH:mm:ss", "dd-MM-yyyy HH:mm:ss"],
                  "target": "event_ts"}},
    )
    return out.select("event_id", "event_ts")


@_q(
    "xml_parse",
    """
    SELECT event_id, event_type AS t, user_id AS u FROM events
    """,
)
def xml_parse(spark, sf_dir):
    ev = _events_msg(
        spark, sf_dir,
        F.concat(
            F.lit("<e><t>"), F.col("event_type"), F.lit("</t><u>"),
            F.col("user_id").cast("string"), F.lit("</u></e>"),
        ),
    )
    out = apply_stage(
        ev, {"xml": {"source": "message", "schema": "t string, u long", "target": "x"}}
    )
    return out.select("event_id", F.col("x.t").alias("t"), F.col("x.u").alias("u"))


# ---------------------------------------------------------------------------
# Mutate family
# ---------------------------------------------------------------------------

@_q(
    "mutate_chain",
    """
    SELECT event_id,
           upper(replace(event_type, 'i', '1')) AS etype,
           upper(replace(event_type, 'i', '1')) AS etype2,
           CAST(user_id AS VARCHAR) AS user_id
    FROM events
    """,
)
def mutate_chain(spark, sf_dir):
    """mutate op-order parity: rename → convert → gsub → uppercase → copy."""
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev,
        {"mutate": {
            "rename": {"event_type": "etype"},
            "convert": {"user_id": "string"},
            "gsub": ["etype", "i", "1"],
            "uppercase": ["etype"],
            "copy": {"etype": "etype2"},
        }},
    )
    return out.select("event_id", "etype", "etype2", "user_id")


@_q(
    "sprintf_add_field",
    """
    SELECT event_id, event_type || '-' || CAST(user_id AS VARCHAR) AS summary
    FROM events
    """,
)
def sprintf_add_field(spark, sf_dir):
    """common option add_field with %{field} sprintf interpolation."""
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev, {"mutate": {"add_field": {"summary": "%{event_type}-%{user_id}"}}}
    )
    return out.select("event_id", "summary")


@_q(
    "translate_inline",
    """
    SELECT event_id,
           CASE event_type
             WHEN 'click' THEN 'engagement' WHEN 'view' THEN 'engagement'
             WHEN 'purchase' THEN 'revenue' WHEN 'signup' THEN 'growth'
             ELSE 'other' END AS category
    FROM events
    """,
)
def translate_inline(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev,
        {"translate": {"source": "event_type", "target": "category",
                       "dictionary": {"click": "engagement", "view": "engagement",
                                      "purchase": "revenue", "signup": "growth"},
                       "fallback": "other"}},
    )
    return out.select("event_id", "category")


@_q(
    "fingerprint_hashes",
    """
    SELECT event_id,
           sha256(event_type || '|' || CAST(user_id AS VARCHAR)) AS fp_sha,
           md5(event_type || '|' || CAST(user_id AS VARCHAR)) AS fp_md5
    FROM events
    """,
)
def fingerprint_hashes(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev, {"fingerprint": {"source": ["event_type", "user_id"],
                             "method": "SHA256", "target": "fp_sha"}}
    )
    out = apply_stage(
        out, {"fingerprint": {"source": ["event_type", "user_id"],
                              "method": "MD5", "target": "fp_md5"}}
    )
    return out.select("event_id", "fp_sha", "fp_md5")


@_q(
    "urldecode_field",
    """
    SELECT event_id, event_type || ' ' || CAST(user_id AS VARCHAR) AS message
    FROM events
    """,
)
def urldecode_field(spark, sf_dir):
    ev = _events_msg(
        spark, sf_dir,
        F.concat(F.col("event_type"), F.lit("%20"), F.col("user_id").cast("string")),
    )
    out = apply_stage(ev, {"urldecode": {"field": "message"}})
    return out.select("event_id", "message")


@_q(
    "truncate_bytes",
    """
    SELECT doc_id,
           CASE WHEN length(text) > 50 THEN substring(text, 1, 50) ELSE text END AS text
    FROM documents
    """,
)
def truncate_bytes(spark, sf_dir):
    # documents text is all-ASCII in the fixture → byte-truncation ≡ chars
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = apply_stage(docs, {"truncate": {"length_bytes": 50, "fields": ["text"]}})
    return out.select("doc_id", "text")


@_q(
    "prune_whitelist",
    "SELECT event_id, event_type FROM events",
)
def prune_whitelist(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return apply_stage(ev, {"prune": {"whitelist_names": ["^event_id$", "^event_type$"]}})


@_q(
    "syslog_pri_decode",
    """
    SELECT event_id,
           CAST(user_id % 192 AS INT) AS pri,
           CAST((user_id % 192) // 8 AS INT) AS syslog_facility_code,
           CAST((user_id % 192) % 8 AS INT) AS syslog_severity_code,
           (['kernel','user-level','mail','daemon','security/authorization',
             'syslogd','line printer','network news','uucp','clock',
             'security/authorization','ftp','ntp','log audit','log alert',
             'clock','local0','local1','local2','local3','local4','local5',
             'local6','local7'])[CAST((user_id % 192) // 8 AS INT) + 1]
             AS syslog_facility,
           (['emergency','alert','critical','error','warning','notice',
             'informational','debug'])[CAST((user_id % 192) % 8 AS INT) + 1]
             AS syslog_severity
    FROM events
    """,
)
def syslog_pri_decode(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "syslog_pri", F.pmod(F.col("user_id"), F.lit(192)).cast("int")
    )
    out = apply_stage(ev, {"syslog_pri": {}})
    return out.select(
        "event_id",
        F.col("syslog_pri").alias("pri"),
        "syslog_facility_code", "syslog_severity_code",
        "syslog_facility", "syslog_severity",
    )


@_q(
    "uuid_deterministic",
    """
    WITH h AS (SELECT event_id, sha256(CAST(event_id AS VARCHAR)) AS hx FROM events)
    SELECT event_id,
           substring(hx,1,8) || '-' || substring(hx,9,4) || '-' ||
           substring(hx,13,4) || '-' || substring(hx,17,4) || '-' ||
           substring(hx,21,12) AS uuid
    FROM h
    """,
)
def uuid_deterministic(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(ev, {"uuid": {"deterministic_from": "event_id"}})
    return out.select("event_id", "uuid")


@_q(
    "de_dot_rename",
    "SELECT event_id, event_type AS user_agent_os FROM events",
)
def de_dot_rename(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("user_agent.os", F.col("event_type"))
    out = apply_stage(ev, {"de_dot": {}})
    return out.select("event_id", F.col("user_agent_os"))


@_q(
    "ruby_vectorized_udf",
    """
    SELECT event_id,
           CAST(length(event_type) AS BIGINT) * user_id AS score
    FROM events
    """,
)
def ruby_vectorized_udf(spark, sf_dir):
    """ruby filter ≙ user-supplied VECTORIZED fn (pd.Series → pd.Series)."""
    ev = _t(spark, sf_dir, "events")

    def score(t, u):  # two pd.Series in, one out — fully vectorized
        return (t.str.len() * u).astype("int64")

    out = apply_stage(
        ev, {"ruby": {"code": score, "source": ["event_type", "user_id"],
                      "target": "score", "returns": "long"}}
    )
    return out.select("event_id", "score")


# ---------------------------------------------------------------------------
# Enrich family (broadcast lookups / range joins)
# ---------------------------------------------------------------------------

_IP_MULT = 2654435761  # Knuth multiplicative hash → deterministic synthetic ip
_GEO_ORACLE = """
    WITH ip AS (
      SELECT event_id, (user_id * 2654435761) % 4294967296 AS ip_int FROM events
    )
    SELECT event_id, 'C' || CAST(ip_int // 16777216 AS VARCHAR) AS country FROM ip
"""


def _with_synth_ip(ev: DataFrame) -> DataFrame:
    ip_int = F.pmod(F.col("user_id") * F.lit(_IP_MULT), F.lit(4294967296))
    octets = [
        F.pmod(F.shiftright(ip_int, 24), F.lit(256)),
        F.pmod(F.shiftright(ip_int, 16), F.lit(256)),
        F.pmod(F.shiftright(ip_int, 8), F.lit(256)),
        F.pmod(ip_int, F.lit(256)),
    ]
    return ev.withColumn("ip", F.concat_ws(".", *[o.cast("string") for o in octets]))


def _geo_slabs(spark: SparkSession) -> DataFrame:
    rows = [
        (k * 2**24, (k + 1) * 2**24 - 1, f"C{k}", f"city{k}", float(k), float(-k))
        for k in range(256)
    ]
    return spark.createDataFrame(
        rows,
        "ip_start_int long, ip_end_int long, country string, city string, "
        "lat double, lon double",
    )


@_q("geoip_broadcast_range", _GEO_ORACLE)
def geoip_broadcast_range(spark, sf_dir):
    """geoip as a native broadcast range join (BroadcastNestedLoop BETWEEN)."""
    ev = _with_synth_ip(_t(spark, sf_dir, "events"))
    out = apply_stage(
        ev, {"geoip": {"source": "ip", "ranges_df": _geo_slabs(spark),
                       "strategy": "broadcast_range"}}
    )
    return out.select("event_id", F.col("geo.country").alias("country"))


@_q("geoip_binary_search", _GEO_ORACLE)
def geoip_binary_search(spark, sf_dir):
    """geoip via broadcast sorted arrays + vectorized np.searchsorted."""
    ev = _with_synth_ip(_t(spark, sf_dir, "events"))
    out = apply_stage(
        ev, {"geoip": {"source": "ip", "ranges_df": _geo_slabs(spark),
                       "strategy": "binary_search"}}
    )
    return out.select("event_id", F.col("geo.country").alias("country"))


@_q(
    "cidr_match",
    f"""
    WITH ip AS (
      SELECT event_id, (user_id * {_IP_MULT}) % 4294967296 AS ip_int FROM events
    )
    SELECT event_id,
           (ip_int BETWEEN {10 * 2**24} AND {11 * 2**24 - 1})
           OR (ip_int BETWEEN {8 * 2**28} AND {9 * 2**28 - 1}) AS in_network
    FROM ip
    """,
)
def cidr_match(spark, sf_dir):
    ev = _with_synth_ip(_t(spark, sf_dir, "events"))
    out, matched = build_stage(
        {"cidr": {"address": "ip", "network": ["10.0.0.0/8", "128.0.0.0/4"]}}
    ).transform(ev)
    return out.select("event_id", F.col("__matched").alias("in_network"))


# ---------------------------------------------------------------------------
# Flow family (drop/clone/split/throttle/aggregate/metrics/multiline)
# ---------------------------------------------------------------------------

@_q(
    "drop_condition",
    "SELECT event_id FROM events WHERE NOT (value < 50)",
)
def drop_condition(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(ev, {"drop": {"when": "[value] < 50"}})
    return out.select("event_id")


@_q(
    "clone_events",
    """
    SELECT event_id, CAST(NULL AS VARCHAR) AS type FROM events
    UNION ALL
    SELECT event_id, 'replica' AS type FROM events
    """,
)
def clone_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(ev, {"clone": {"clones": ["replica"]}})
    return out.select("event_id", "type")


@_q(
    "split_words",
    "SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents",
)
def split_words(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = apply_stage(
        docs, {"split": {"field": "text", "terminator": " ", "target": "word"}}
    )
    return out.select("doc_id", "word")


@_q(
    "throttle_rate",
    """
    SELECT event_id,
           row_number() OVER (
             PARTITION BY event_type, time_bucket(INTERVAL '3600 seconds', ts)
             ORDER BY ts
           ) > 5 AS throttled
    FROM events
    """,
)
def throttle_rate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out, matched = build_stage(
        {"throttle": {"key": "event_type", "period": 3600, "after_count": 5,
                      "timestamp_field": "ts"}}
    ).transform(ev)
    return out.select("event_id", F.col("__matched").alias("throttled"))


@_q(
    "aggregate_by_task",
    """
    SELECT user_id,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS total_micros,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def aggregate_by_task(spark, sf_dir):
    """aggregate filter: per-task_id reduce via applyInPandas (keys = the
    parallel unit, unlike the reference's workers=1 constraint)."""
    import numpy as np
    import pandas as pd

    def reduce_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        micros = np.floor(pdf["value"].to_numpy() * 1e6).astype("int64")
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]],
             "total_micros": [int(micros.sum())],
             "n": [len(pdf)]}
        )

    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev,
        {"aggregate": {"task_id": "user_id", "code": reduce_fn,
                       "schema": "user_id long, total_micros long, n long"}},
    )
    return out


# EWMA constants for flush_interval=3600 (must byte-match the stage's
# float math — see MetricsStage: a = 2/(60/interval + 1), b = 1-a)
_EWMA_A = 2.0 / (60.0 / 3600 + 1.0)
_EWMA_B = 1.0 - _EWMA_A

@_q(
    "metrics_meter",
    f"""
    WITH counts AS (
      SELECT CAST(event_type AS VARCHAR) AS meter,
             time_bucket(INTERVAL '3600 seconds', ts) AS ws,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), rated AS (
      SELECT meter, ws, cnt, cnt / 3600.0 AS rate FROM counts
    ), packed AS (
      SELECT meter,
             list(ws ORDER BY ws) AS wss,
             list(cnt ORDER BY ws) AS cnts,
             list(rate ORDER BY ws) AS rates
      FROM rated GROUP BY meter
    )
    SELECT meter,
           unnest(wss) AS window_start,
           unnest(cnts) AS count,
           unnest(rates) AS rate,
           unnest(list_transform(generate_series(1, len(rates)),
                  i -> round(list_reduce(list_slice(rates, 1, i),
                       (acc, r) -> CAST({_EWMA_A!r} AS DOUBLE) * r
                                 + CAST({_EWMA_B!r} AS DOUBLE) * acc), 6)))
             AS rate_1m
    FROM packed
    """,
)
def metrics_meter(spark, sf_dir):
    """metrics filter incl. the recursive EWMA rate — the oracle
    replicates the same left-fold (list_reduce seeds with the first
    element, f(acc, r) = a·r + b·acc); both sides round to 6 decimals
    (DuckDB's fold fuses the multiply-add, ~1e-18 apart from numpy)."""
    ev = _t(spark, sf_dir, "events")
    out, _ = build_stage(
        {"metrics": {"meter": "event_type", "flush_interval": 3600,
                     "timestamp_field": "ts"}}
    ).transform(ev)
    return out.select("meter", "window_start", "count", "rate",
                      F.round("rate_1m", 6).alias("rate_1m"))


@_q(
    "multiline_merge",
    """
    WITH lines AS (
      SELECT user_id % 5 AS stream, event_id AS eid,
             CASE WHEN value < 50 THEN ' ' || event_type ELSE event_type END AS message
      FROM events
    ), g AS (
      SELECT stream, eid, message,
             SUM(CASE WHEN regexp_matches(message, '^\\s') THEN 0 ELSE 1 END)
               OVER (PARTITION BY stream ORDER BY eid) AS grp
      FROM lines
    )
    SELECT stream, min(eid) AS eid,
           array_to_string(list(message ORDER BY eid), chr(10)) AS message,
           count(*) AS n_lines
    FROM g GROUP BY stream, grp
    """,
)
def multiline_merge(spark, sf_dir):
    """multiline codec → sessionization (running-sum group ids + ordered merge)."""
    ev = _t(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(5)).alias("stream"),
        F.col("event_id").alias("eid"),
        F.when(F.col("value") < 50, F.concat(F.lit(" "), F.col("event_type")))
        .otherwise(F.col("event_type")).alias("message"),
    )
    out = apply_stage(
        ev,
        {"multiline": {"pattern": r"^\s", "what": "previous", "source": "message",
                       "group_by": "stream", "order_by": "eid"}},
    )
    return out.select("stream", "eid", "message", "n_lines")


# ---------------------------------------------------------------------------
# Conditions & routing
# ---------------------------------------------------------------------------

@_q(
    "conditions_surface",
    """
    SELECT event_id,
           event_type = 'error' AS c_eq,
           value > 250 AS c_gt,
           regexp_matches(event_type, '^e') AS c_regex,
           event_type IN ('click', 'view') AS c_in,
           event_type NOT IN ('click', 'view') AS c_not_in,
           (value > 250 AND event_type = 'click') OR value <= 10 AS c_bool,
           (value > 250) != (event_type = 'click') AS c_xor
    FROM events
    """,
)
def conditions_surface(spark, sf_dir):
    """One column per EventCondition operator class (SURVEY §2.1)."""
    ev = _t(spark, sf_dir, "events")
    conds = {
        "c_eq": "[event_type] == 'error'",
        "c_gt": "[value] > 250",
        "c_regex": "[event_type] =~ /^e/",
        "c_in": "[event_type] in ['click', 'view']",
        "c_not_in": "[event_type] not in ['click', 'view']",
        "c_bool": "([value] > 250 and [event_type] == 'click') or [value] <= 10",
        "c_xor": "[value] > 250 xor [event_type] == 'click'",
    }
    for name, expr in conds.items():
        ev = ev.withColumn(name, compile_condition(expr, ev))
    return ev.select("event_id", *conds)


@_q(
    "route_sink_counts",
    """
    SELECT 'sink_errors' AS sink, count(*) AS n FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT 'sink_highvalue' AS sink, count(*) AS n FROM events WHERE value > 400
    UNION ALL
    SELECT 'sink_rest' AS sink, count(*) AS n FROM events
    WHERE NOT (event_type = 'error') AND value <= 400
    """,
)
def route_sink_counts(spark, sf_dir):
    """Fan-out router branch predicates → per-sink aggregate counts (the
    north rule's per-sink counts, minus the writes)."""
    ev = _t(spark, sf_dir, "events")
    branches = {
        "sink_errors": "[event_type] == 'error'",
        "sink_highvalue": "[value] > 400",
        "sink_rest": "!([event_type] == 'error') and [value] <= 400",
    }
    parts = [
        ev.filter(compile_condition(cond, ev))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(name).alias("sink"), "n")
        for name, cond in branches.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


# ---------------------------------------------------------------------------
# Relational rollups (SURVEY §2.6: free-with-Spark surface, exercised
# against TPC-H-ish tables; integer-cents math for exact hashes)
# ---------------------------------------------------------------------------

@_q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_cents,
           CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
             AS sum_disc_cents,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_base_cents"),
        F.sum(F.round(F.col("l_discount") * 100).cast("long")).alias("sum_disc_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_q(
    "top_customers",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2, 3
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT 10
    """,
)
def top_customers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey"))
        .limit(10)
    )


@_q(
    "events_daily_rollup",
    """
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros
    FROM events GROUP BY 1, 2
    """,
)
def events_daily_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("value_micros"),
    )


@_q(
    "events_rollup_hierarchy",
    """
    SELECT event_type,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
           count(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros
    FROM events GROUP BY ROLLUP(event_type, month)
    """,
)
def events_rollup_hierarchy(spark, sf_dir):
    """GROUP BY ROLLUP (SURVEY §2.6 'free with Spark' row exercised):
    (type, month) + per-type subtotals + grand total in one pass."""
    ev = _t(spark, sf_dir, "events")
    return ev.rollup(
        "event_type", F.date_trunc("MONTH", F.col("ts")).alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("value_micros"),
    )


@_q(
    "semi_anti_joins",
    """
    SELECT 'with_orders' AS kind, count(*) AS n FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS kind, count(*) AS n FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_anti_joins(spark, sf_dir):
    """left_semi / left_anti joins (§2.6: set-membership between event
    streams — beyond the reference's lookup-only join surface)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("with_orders").alias("kind"), "n")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("without_orders").alias("kind"), "n")
    return semi.unionByName(anti)


@_q(
    "window_function_battery",
    """
    SELECT event_id,
           lag(event_id) OVER w AS prev_id,
           lead(event_id) OVER w AS next_id,
           rank() OVER (PARTITION BY event_type ORDER BY CAST(FLOOR(value * 1000000) AS BIGINT) DESC, event_id) AS value_rank,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT))
                OVER (PARTITION BY event_type ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_micros
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY event_id)
    """,
)
def window_function_battery(spark, sf_dir):
    """lag/lead/rank/running-sum over partitions (§2.6 window surface;
    integer-micros discipline for the running sum)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    micros = F.floor(F.col("value") * 1000000).cast("long")
    wrank = Window.partitionBy("event_type").orderBy(F.col("__m").desc(), F.col("event_id"))
    return (
        ev.withColumn("__m", micros)
        .select(
            "event_id",
            F.lag("event_id").over(w).alias("prev_id"),
            F.lead("event_id").over(w).alias("next_id"),
            F.rank().over(wrank).alias("value_rank"),
            F.sum("__m").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("running_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data pipeline ops: dedup / similarity / text analysis
# ---------------------------------------------------------------------------

@_q(
    "dedup_exact",
    """
    SELECT doc_id FROM (
      SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id")


@_q("dedup_minhash_lsh")  # seeded xxhash64 signatures — no SQL oracle (rows-only)
def dedup_minhash_lsh(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup(docs, threshold=0.8).select("doc_id")


@_q("dedup_simhash")  # seeded xxhash64 + bit votes — no SQL oracle (rows-only)
def dedup_simhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return simhash_dedup(docs, max_hamming=3).select("doc_id")


@_q(
    "ngram_jaccard_pairs",
    """
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 3
                  THEN list_distinct(list_transform(
                         generate_series(1, len(ws) - 2),
                         i -> array_to_string(list_slice(ws, i, i + 2), ' ')))
                  ELSE [array_to_string(ws, ' ')] END AS sh
      FROM w
    ), inv AS (
      SELECT doc_id, unnest(sh) AS shingle FROM sh
    ), cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
    ), j AS (
      SELECT a, b,
             len(list_intersect(sa.sh, sb.sh))
               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
               AS jaccard
      FROM cand JOIN sh sa ON sa.doc_id = cand.a JOIN sh sb ON sb.doc_id = cand.b
    )
    SELECT a, b, round(jaccard, 4) AS jaccard FROM j WHERE jaccard >= 0.5
    """,
)
def ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5)
    return pairs.select("a", "b", F.round("jaccard", 4).alias("jaccard"))


# binary-exact query-vector literals (1.0 / 0.5 / -0.25 cycle over 64 dims)
_QVEC = [(1.0, 0.5, -0.25)[i % 3] for i in range(64)]
_QVEC_SQL = "[" + ", ".join(repr(x) for x in _QVEC) + "]"


@_q(
    "similarity_cosine_topk",
    f"""
    WITH q AS (SELECT CAST({_QVEC_SQL} AS DOUBLE[]) AS qv), sims AS (
      SELECT vec_id,
             round(
               list_reduce(list_prepend(0.0, list_transform(
                 generate_series(1, 64),
                 i -> CAST(embedding[i] AS DOUBLE) * qv[i])), (a, b) -> a + b)
               / (sqrt(list_reduce(list_prepend(0.0, list_transform(
                    generate_series(1, 64),
                    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                    (a, b) -> a + b))
                * sqrt(list_reduce(list_prepend(0.0, list_transform(
                    generate_series(1, 64), i -> qv[i] * qv[i])), (a, b) -> a + b))),
               6) AS cosine
      FROM embeddings, q
    )
    SELECT vec_id, cosine FROM sims ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def similarity_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _QVEC, k=10)


@_q("similarity_ann_lsh")  # seeded hyperplanes — no SQL oracle (rows-only)
def similarity_ann_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, _QVEC, k=10, n_planes=8, multiprobe=2)


@_q("similarity_ann_ivf")  # seeded centroids — no SQL oracle (rows-only)
def similarity_ann_ivf(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return ann_ivf_topk(emb, _QVEC, k=10, n_centroids=16, nprobe=4)


def _sql_marker_count(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter(ws, x -> x IN ({markers})))"


_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

_TEXTSTATS_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
      FROM documents
    ), hits AS (
      SELECT doc_id, text, ws,
             {_sql_marker_count('en')} AS c_en,
             {_sql_marker_count('de')} AS c_de,
             {_sql_marker_count('fr')} AS c_fr,
             {_sql_marker_count('es')} AS c_es,
             {_sql_marker_count('it')} AS c_it,
             CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS n_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
               AS n_bpe_tokens,
             CASE WHEN len(ws) > 0 THEN
               list_reduce(list_prepend(0.0,
                 list_transform(ws, x -> CAST(length(x) AS DOUBLE))), (a,b) -> a+b)
               / len(ws) ELSE 0.0 END AS mwl,
             CASE WHEN length(text) > 0 THEN
               length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g'))
               / length(text) ELSE 0.0 END AS pr,
             CASE WHEN len(ws) > 0 THEN
               len(list_filter(ws, x -> x IN ({_STOP_SQL}))) / len(ws)
               ELSE 0.0 END AS sr
      FROM base
    )
    SELECT doc_id, n_tokens, n_bpe_tokens,
           CASE WHEN greatest(c_en, c_de, c_fr, c_es, c_it) < 1 THEN 'und'
                WHEN c_en = greatest(c_en, c_de, c_fr, c_es, c_it) THEN 'en'
                WHEN c_de = greatest(c_en, c_de, c_fr, c_es, c_it) THEN 'de'
                WHEN c_fr = greatest(c_en, c_de, c_fr, c_es, c_it) THEN 'fr'
                WHEN c_es = greatest(c_en, c_de, c_fr, c_es, c_it) THEN 'es'
                ELSE 'it' END AS lang_detected,
           CAST(round((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.4
                       WHEN n_tokens > 0 THEN 0.1 ELSE 0.0 END)
                 + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 0.3 ELSE 0.0 END)
                 + (CASE WHEN pr <= 0.2 THEN 0.2 ELSE 0.0 END)
                 + (CASE WHEN sr > 0.0 THEN 0.1 ELSE 0.0 END), 2) AS DOUBLE) AS quality
    FROM hits
"""


@_q("textstats_quality", _TEXTSTATS_ORACLE)
def textstats_quality(spark, sf_dir):
    """language-ID + quality scoring + token counts — all native Columns."""
    from .datapipe.dedup import _spread

    docs = _spread(_t(spark, sf_dir, "documents"))
    c = F.col("text")
    return docs.select(
        "doc_id",
        whitespace_token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        detect_language(c).alias("lang_detected"),
        quality_score(c).alias("quality"),
    )


@_q(
    "salted_skew_aggregate",
    "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
)
def salted_skew_aggregate(spark, sf_dir):
    """Two-phase salted applyInPandas over the Zipf-skewed lang key —
    the hot key ('en' ≈ 55%) reduces across 8 salt sub-groups first."""
    from .datapipe.skew import salted_group_count

    docs = _t(spark, sf_dir, "documents")
    return salted_group_count(docs, ["lang"], salt_on="text", n_salt=8)


@_q("textstats_fingerprint")  # crc32 rolling hash — DuckDB lacks crc32 (rows-only)
def textstats_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_fingerprint(F.col("text")).alias("fingerprint_rolling")
    )


# ---------------------------------------------------------------------------
# Round-2 coverage: useragent / tld / truthiness / DLQ / resume / syslog
# grok / translate file+regex dicts / HMAC / aggregate timeout events
# ---------------------------------------------------------------------------

_UA_STRINGS = [
    "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/102.0",
    "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X) Version/16.0 Safari/605.1",
    "acmebot/2.1 (+http://acme.example/bot)",
]
# (pattern, name, os, device, priority) — priority order IS the matching
# contract (uap-core: first rule wins), which is why Chrome outranks
# Safari despite both substrings appearing in Chrome UAs.
_UA_RULES = [
    ("bot", "AcmeBot", "Other", "Spider", 0),
    ("Firefox/", "Firefox", "Linux", "Other", 1),
    ("Chrome/", "Chrome", "Windows", "Other", 2),
    ("Safari", "Safari", "Mac OS X", "Other", 3),
]


@_q(
    "useragent_parse",
    f"""
    WITH ua AS (
      SELECT event_id,
             (['{_UA_STRINGS[0]}', '{_UA_STRINGS[1]}',
               '{_UA_STRINGS[2]}', '{_UA_STRINGS[3]}'])[CAST(user_id % 4 AS INT) + 1]
               AS agent
      FROM events
    )
    SELECT event_id,
           CASE WHEN regexp_matches(agent, 'bot') THEN 'AcmeBot'
                WHEN regexp_matches(agent, 'Firefox/') THEN 'Firefox'
                WHEN regexp_matches(agent, 'Chrome/') THEN 'Chrome'
                WHEN regexp_matches(agent, 'Safari') THEN 'Safari' END AS ua_name,
           CASE WHEN regexp_matches(agent, 'bot') THEN 'Other'
                WHEN regexp_matches(agent, 'Firefox/') THEN 'Linux'
                WHEN regexp_matches(agent, 'Chrome/') THEN 'Windows'
                WHEN regexp_matches(agent, 'Safari') THEN 'Mac OS X' END AS ua_os,
           CASE WHEN regexp_matches(agent, 'bot') THEN 'Spider'
                ELSE 'Other' END AS ua_device
    FROM ua
    """,
)
def useragent_parse(spark, sf_dir):
    """useragent filter, native strategy: priority-ordered when/rlike
    chain (uap-core first-match contract), zero Python."""
    return _useragent_query(spark, sf_dir, "native")


def _useragent_query(spark, sf_dir, strategy):
    ev = _t(spark, sf_dir, "events").withColumn(
        "agent",
        F.element_at(
            F.array(*[F.lit(u) for u in _UA_STRINGS]),
            F.pmod(F.col("user_id"), F.lit(4)).cast("int") + 1,
        ),
    )
    rules = spark.createDataFrame(
        _UA_RULES, "pattern string, name string, os string, device string, priority int"
    )
    out = apply_stage(
        ev, {"useragent": {"source": "agent", "rules_df": rules, "strategy": strategy}}
    )
    return out.select(
        "event_id",
        F.col("ua.name").alias("ua_name"),
        F.col("ua.os").alias("ua_os"),
        F.col("ua.device").alias("ua_device"),
    )


@_q("useragent_pandas_path", ORACLES["useragent_parse"])
def useragent_pandas_path(spark, sf_dir):
    """useragent filter, pandas strategy (the uap-core-scale path for
    thousands of rules): broadcast rule set + vectorized str.contains
    over only still-unmatched rows."""
    return _useragent_query(spark, sf_dir, "pandas")


@_q(
    "tld_extract",
    """
    WITH u AS (
      SELECT event_id,
             'www.' || event_type ||
             (['.com', '.co.uk', '.org'])[CAST(user_id % 3 AS INT) + 1] AS host,
             CAST(user_id % 3 AS INT) AS k
      FROM events
    )
    SELECT event_id, host AS domain,
           (['com', 'co.uk', 'org'])[k + 1] AS tld
    FROM u
    """,
)
def tld_extract(spark, sf_dir):
    """tld filter: public-suffix longest-match when-chain ('co.uk' must
    win over 'uk') over try_parse_url host extraction."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "url",
        F.concat(
            F.lit("https://www."), F.col("event_type"),
            F.element_at(
                F.array(F.lit(".com"), F.lit(".co.uk"), F.lit(".org")),
                F.pmod(F.col("user_id"), F.lit(3)).cast("int") + 1,
            ),
            F.lit("/p"),
        ),
    )
    out = apply_stage(
        ev, {"tld": {"source": "url", "suffixes": ["com", "org", "uk", "co.uk"]}}
    )
    return out.select("event_id", "domain", "tld")


@_q(
    "truthiness_conditions",
    """
    WITH t AS (
      SELECT event_id,
             CASE WHEN value < 50 THEN NULL ELSE event_type END AS maybe,
             CASE WHEN value > 400 THEN NULL ELSE value > 250 END AS flag
      FROM events
    )
    SELECT event_id,
           maybe IS NOT NULL AS t_field,
           flag IS NOT NULL AND flag AS t_bool,
           NOT (maybe IS NOT NULL) AS t_not
    FROM t
    """,
)
def truthiness_conditions(spark, sf_dir):
    """Bare `if [f]` truthiness: existence for non-boolean fields,
    existence AND true for booleans; `![f]` negation (EventCondition
    'truthy' branch)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") < 50, F.lit(None)).otherwise(F.col("event_type")).alias("maybe"),
        F.when(F.col("value") > 400, F.lit(None)).otherwise(F.col("value") > 250).alias("flag"),
    )
    return ev.select(
        "event_id",
        compile_condition("[maybe]", ev).alias("t_field"),
        compile_condition("[flag]", ev).alias("t_bool"),
        compile_condition("![maybe]", ev).alias("t_not"),
    )


@_q(
    "dlq_route",
    """
    SELECT event_id,
           '_grokparsefailure' AS error_stage,
           '_grokparsefailure' AS error_reason
    FROM events WHERE value < 50
    """,
)
def dlq_route(spark, sf_dir):
    """Dead-letter queue projection: rows with failure tags → the DLQ
    schema (error_stage = first failure tag, error_reason = all tags,
    original payload struct) — DeadLetterQueueWriter/DLQEntry parity."""
    from .router import dlq_projection, failure_tag_predicate

    ev = _events_msg(
        spark, sf_dir,
        F.when(F.col("value") < 50, F.lit("garbage line"))
        .otherwise(F.concat(F.lit("id="), F.col("user_id").cast("string"))),
    )
    parsed = apply_stage(ev, {"grok": {"match": {"message": "id=%{INT:uid}"}}})
    dlq = dlq_projection(parsed.filter(failure_tag_predicate(parsed)))
    return dlq.select(
        F.col("original.event_id").alias("event_id"), "error_stage", "error_reason"
    )


@_q(
    "checkpoint_resume",
    """
    SELECT 'sink_hi' AS sink, count(*) AS n FROM events WHERE value > 250
    UNION ALL
    SELECT 'sink_lo' AS sink, count(*) AS n FROM events WHERE NOT (value > 250)
    """,
)
def checkpoint_resume(spark, sf_dir):
    """END-TO-END resume: run a routed pipeline in 4 micro-batches,
    crash after batch 0 (simulated), resume from the checkpoint
    manifest, then count the rows actually SITTING IN the sink parquet.
    The oracle is the branch predicate — equality proves the crashual
    rerun neither lost nor duplicated any bucket's rows."""
    import shutil

    from .pipeline import Pipeline

    run_dir = f"/tmp/suite_ckpt_resume_{abs(hash(sf_dir)) % 10**8}"
    shutil.rmtree(run_dir, ignore_errors=True)
    ev = _t(spark, sf_dir, "events")
    spec = {
        "id": "resume_suite",
        "filters": [],
        "outputs": [
            {"name": "sink_hi", "when": "[value] > 250"},
            {"name": "sink_lo", "when": "!([value] > 250)"},
        ],
    }
    pipe = Pipeline(spec)
    try:
        pipe.run(ev, run_dir, bucket_on="event_id", n_buckets=8, n_batches=4,
                 _fail_after_batch=0)
    except RuntimeError:
        pass  # the simulated crash
    Pipeline(spec).run(ev, run_dir, bucket_on="event_id", n_buckets=8, n_batches=4,
                       resume=True)
    parts = [
        spark.read.parquet(f"{run_dir}/{name}")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(name).alias("sink"), "n")
        for name in ("sink_hi", "sink_lo")
    ]
    return parts[0].unionByName(parts[1])


@_q(
    "streaming_route_counts",
    """
    SELECT 'sink_hot' AS sink, count(*) AS n FROM events WHERE value > 300
    UNION ALL
    SELECT 'sink_cold' AS sink, count(*) AS n FROM events WHERE NOT (value > 300)
    """,
)
def streaming_route_counts(spark, sf_dir):
    """Structured-Streaming execution path end-to-end: the same compiled
    pipeline run via foreachBatch over a file stream in TWO micro-batches
    (maxFilesPerTrigger=1), sinks appended per batch — then the parquet
    actually on disk is counted against the branch-predicate oracle."""
    import shutil

    from .pipeline import Pipeline
    from .streaming import run_streaming, stream_from_directory

    tag = abs(hash(sf_dir)) % 10**8
    src = f"/tmp/suite_stream_src_{tag}"
    run_dir = f"/tmp/suite_stream_run_{tag}"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(run_dir, ignore_errors=True)
    ev = _t(spark, sf_dir, "events")
    ev.coalesce(2).write.parquet(src)
    spec = {
        "id": "stream_suite",
        "filters": [],
        "outputs": [
            {"name": "sink_hot", "when": "[value] > 300"},
            {"name": "sink_cold", "when": "!([value] > 300)"},
        ],
    }
    pipe = Pipeline(spec)
    stream = stream_from_directory(
        spark, src,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        max_files_per_trigger=1,
    )
    run_streaming(pipe, stream, run_dir, bucket_on="event_id", n_buckets=4,
                  timeout_sec=600)
    parts = [
        spark.read.parquet(f"{run_dir}/{name}")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(name).alias("sink"), "n")
        for name in ("sink_hot", "sink_cold")
    ]
    return parts[0].unionByName(parts[1])


@_q(
    "grok_syslogline",
    """
    SELECT event_id,
           'Jan ' || CAST(user_id % 27 + 1 AS VARCHAR) || ' '
                  || strftime(ts, '%H:%M:%S') AS timestamp,
           'host' || CAST(user_id % 10 AS VARCHAR) AS logsource,
           event_type AS program,
           CAST(user_id % 5000 + 1 AS VARCHAR) AS pid,
           'done id=' || CAST(event_id AS VARCHAR) AS message
    FROM events
    """,
)
def grok_syslogline(spark, sf_dir):
    """SYSLOGLINE composite (linux-syslog family): timestamp + host +
    program[pid] + message captures from one pattern-library entry."""
    ev = _events_msg(
        spark, sf_dir,
        F.concat(
            F.lit("Jan "), (F.pmod(F.col("user_id"), F.lit(27)) + 1).cast("string"),
            F.lit(" "), F.date_format("ts", "HH:mm:ss"),
            F.lit(" host"), F.pmod(F.col("user_id"), F.lit(10)).cast("string"),
            F.lit(" "), F.col("event_type"),
            F.lit("["), (F.pmod(F.col("user_id"), F.lit(5000)) + 1).cast("string"),
            F.lit("]: done id="), F.col("event_id").cast("string"),
        ),
    )
    out = apply_stage(
        ev, {"grok": {"match": {"message": "%{SYSLOGLINE}"},
                      "overwrite": ["message"]}}
    )
    return out.select("event_id", "timestamp", "logsource", "program", "pid", "message")


_TRANSLATE_ORACLE = """
    SELECT event_id,
           CASE event_type
             WHEN 'click' THEN 'engagement' WHEN 'view' THEN 'engagement'
             WHEN 'purchase' THEN 'revenue' ELSE 'other' END AS category
    FROM events
"""


@_q("translate_file_dict", _TRANSLATE_ORACLE)
def translate_file_dict(spark, sf_dir):
    """translate with a FILE dictionary (translate.rb YAML/CSV/JSON
    dictionary_path) — loaded once at plan time into a literal map."""
    import json as _json

    path = "/tmp/suite_translate_dict.json"
    with open(path, "w") as f:
        _json.dump({"click": "engagement", "view": "engagement",
                    "purchase": "revenue"}, f)
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev,
        {"translate": {"source": "event_type", "target": "category",
                       "dictionary_path": path, "fallback": "other"}},
    )
    return out.select("event_id", "category")


@_q(
    "translate_regex_keys",
    """
    SELECT event_id,
           CASE WHEN regexp_matches(event_type, '^(click|view)$') THEN 'engagement'
                WHEN regexp_matches(event_type, 'chase') THEN 'revenue'
                ELSE 'other' END AS category
    FROM events
    """,
)
def translate_regex_keys(spark, sf_dir):
    """translate with regex keys (exact => false): ordered rlike
    when-chain, first matching key wins."""
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev,
        {"translate": {"source": "event_type", "target": "category",
                       "dictionary": {"^(click|view)$": "engagement",
                                      "chase": "revenue"},
                       "exact": False, "fallback": "other"}},
    )
    return out.select("event_id", "category")


def _hmac_literal_oracle() -> str:
    import hashlib
    import hmac as _hmac

    whens = "\n".join(
        f"             WHEN '{t}' THEN '{_hmac.new(b's3cr3t', t.encode(), hashlib.sha256).hexdigest()}'"
        for t in ("click", "error", "purchase", "signup", "view")
    )
    return f"""
    SELECT event_id,
           CASE event_type
{whens}
           END AS fp
    FROM events
    """


@_q("fingerprint_hmac", _hmac_literal_oracle())
def fingerprint_hmac(spark, sf_dir):
    """fingerprint with key ⇒ TRUE RFC-2104 HMAC-SHA256 (OpenSSL::HMAC
    parity). The oracle's expected digests are computed by Python's
    stdlib hmac — an independent implementation, stronger than a SQL
    re-derivation."""
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev, {"fingerprint": {"source": "event_type", "method": "SHA256",
                             "key": "s3cr3t", "target": "fp"}}
    )
    return out.select("event_id", "fp")


@_q("dedup_embedding_neardup")  # seeded hyperplane LSH — no SQL oracle (rows-only)
def dedup_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs: hyperplane-LSH bucket equi-join
    + exact cosine verify (the fifth dedup family). The fixture's random
    vectors have no natural near-dups (max pairwise cosine ≈ 0.4), so
    the corpus is augmented with deterministic SCALED COPIES of the
    first 25 vectors (cosine is scale-invariant ⇒ each copy pairs with
    its source at cosine 1.0) — the bucket join and the verify both do
    real work and the result is a stable row set."""
    from .datapipe.dedup import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    copies = (
        emb.filter(F.col("vec_id") < 25)
        .select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.transform(F.col("embedding"), lambda x: x * F.lit(2.0)).alias("embedding"),
            "label",
        )
    )
    corpus = emb.unionByName(copies)
    return embedding_neardup_pairs(corpus, threshold=0.95).select(
        "a", "b", F.round("cosine", 4).alias("cosine")
    )


@_q(
    "heartbeat_input",
    """
    SELECT 'ping' AS message,
           TIMESTAMP '2026-06-01 00:00:00' + INTERVAL (i * 30) SECOND AS event_ts,
           CAST(i AS BIGINT) AS sequence
    FROM generate_series(0, 4) AS t(i)
    """,
)
def heartbeat_input(spark, sf_dir):
    """heartbeat input: periodic marker events (range + interval)."""
    from .sources import resolve_input

    return resolve_input(
        spark, "heartbeat",
        {"count": 5, "interval": 30, "start_ts": "2026-06-01 00:00:00",
         "message": "ping"},
    )


@_q(
    "environment_fields",
    """
    SELECT event_id, 'suite-env-value' AS deployment FROM events
    """,
)
def environment_fields(spark, sf_dir):
    """environment filter: env vars → plan-time literal fields."""
    import os

    os.environ["LS_SPARK_SUITE_ENV"] = "suite-env-value"
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev, {"environment": {"add_field_from_env": {"deployment": "LS_SPARK_SUITE_ENV"}}}
    )
    return out.select("event_id", "deployment")


@_q(
    "extractnumbers_scalars",
    r"""
    WITH m AS (
      SELECT event_id,
             'x' || CAST(user_id AS VARCHAR) || ' y' || CAST(event_id AS VARCHAR)
                 || ' z-42 w3.25' AS msg
      FROM events
    ), ex AS (
      SELECT event_id,
             list_transform(regexp_extract_all(msg, '[+-]?\d+(?:\.\d+)?'),
                            s -> CAST(s AS DOUBLE)) AS nums
      FROM m
    )
    SELECT event_id,
           CAST(len(nums) AS INT) AS n_numbers,
           nums[1] AS first_number,
           nums[len(nums)] AS last_number
    FROM ex
    """,
)
def extractnumbers_scalars(spark, sf_dir):
    """extractnumbers filter: every number in the string → array<double>
    (scalars selected here for exact cross-engine comparison)."""
    ev = _events_msg(
        spark, sf_dir,
        F.concat(F.lit("x"), F.col("user_id").cast("string"),
                 F.lit(" y"), F.col("event_id").cast("string"),
                 F.lit(" z-42 w3.25")),
    )
    out = apply_stage(ev, {"extractnumbers": {"source": "message"}})
    nums = F.col("extracted_numbers")
    return out.select(
        "event_id",
        F.size(nums).alias("n_numbers"),
        F.get(nums, 0).alias("first_number"),
        F.get(nums, F.size(nums) - 1).alias("last_number"),
    )


@_q(
    "range_check",
    """
    SELECT event_id,
           value BETWEEN 100 AND 400 AS in_val_range,
           length(event_type) BETWEEN 1 AND 5 AS len_in_range
    FROM events
    """,
)
def range_check(spark, sf_dir):
    """range filter: numeric value ranges + string-length ranges."""
    ev = _t(spark, sf_dir, "events")
    out1, _ = build_stage({"range": {"ranges": [["value", 100, 400]]}}).transform(ev)
    out1 = out1.withColumnRenamed("__matched", "in_val_range")
    out2, _ = build_stage({"range": {"ranges": [["event_type", 1, 5]]}}).transform(out1)
    return out2.select(
        "event_id", "in_val_range", F.col("__matched").alias("len_in_range")
    )


@_q("jdbc_static_enrich", _TRANSLATE_ORACLE)
def jdbc_static_enrich(spark, sf_dir):
    """jdbc_static filter (logstash-integration-jdbc): preload a DB
    table, enrich per event via a local lookup — here literally
    `spark.read.jdbc` → broadcast hash join. Runs against the Derby
    EMBEDDED driver that ships inside the Spark distribution, so the
    whole jdbc path (write dim → read dim → join) executes for real."""
    url = f"jdbc:derby:/tmp/suite_derby_{abs(hash(sf_dir)) % 10**8};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        "etype string, category string",
    )
    dim.write.mode("overwrite").format("jdbc").options(
        url=url, dbtable="dim_categories", driver=driver
    ).save()
    from .sources import resolve_input

    jdbc_dim = resolve_input(
        spark, "jdbc",
        {"jdbc_connection_string": url, "dbtable": "dim_categories",
         "jdbc_driver_class": driver},
    )
    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev,
        {"translate": {"source": "event_type", "target": "category",
                       "dictionary_df": jdbc_dim, "fallback": "other"}},
    )
    return out.select("event_id", "category")


@_q(
    "translate_multicol_dim",
    """
    SELECT event_id,
           CASE event_type WHEN 'click' THEN 'engagement'
                WHEN 'purchase' THEN 'revenue' END AS category,
           CASE event_type WHEN 'click' THEN 10
                WHEN 'purchase' THEN 99 END AS weight
    FROM events
    """,
)
def translate_multicol_dim(spark, sf_dir):
    """translate/jdbc_static with a MULTI-COLUMN dimension: the dim's
    value columns pack into one struct target (the jdbc_static shape
    the flagship's dominfo uses); struct fields selected as scalars for
    exact cross-engine comparison."""
    ev = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", "engagement", 10), ("purchase", "revenue", 99)],
        "etype string, category string, weight int",
    )
    out = apply_stage(
        ev,
        {"translate": {"source": "event_type", "target": "info",
                       "dictionary_df": dim}},
    )
    return out.select(
        "event_id",
        F.col("info.category").alias("category"),
        F.col("info.weight").alias("weight"),
    )


@_q(
    "aggregate_timeout_flush",
    """
    SELECT user_id, false AS is_timeout_event, CAST(NULL AS BIGINT) AS n, event_id
    FROM events
    UNION ALL
    SELECT user_id, true AS is_timeout_event, count(*) AS n,
           CAST(NULL AS BIGINT) AS event_id
    FROM events GROUP BY user_id
    """,
)
def aggregate_timeout_flush(spark, sf_dir):
    """aggregate push_map_as_event_on_timeout: originals flow through
    AND one flushed map event per task_id is appended (batch timeout =
    end-of-input; streaming path: streaming.aggregate_stream)."""
    import pandas as pd

    def reduce_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({"user_id": [pdf["user_id"].iloc[0]], "n": [len(pdf)]})

    ev = _t(spark, sf_dir, "events")
    out = apply_stage(
        ev,
        {"aggregate": {"task_id": "user_id", "code": reduce_fn,
                       "schema": "user_id long, n long",
                       "push_map_as_event": True}},
    )
    return out.select("user_id", "is_timeout_event", "n", "event_id")
