"""Grok: named-pattern regex extraction, compiled once, applied vectorized.

Reference counterparts:
* filter — logstash-filter-grok:lib/logstash/filters/grok.rb
  (``match``, ``break_on_match``, ``keep_empty_captures``,
  ``tag_on_failure`` default ``["_grokparsefailure"]``, type
  conversions ``%{NUMBER:bytes:int}``);
* pattern library — logstash-patterns-core:patterns/legacy/grok-patterns
  (the named patterns below are an independently written, functionally
  equivalent subset covering the Apache/syslog families; Oniguruma
  constructs outside Python ``re`` — possessive quantifiers, named
  char classes — are documented unsupported, SURVEY §7 risks).

Spark mapping (SURVEY §2.4): the grok expression compiles at plan time
into ONE Python regex with named groups; execution is a vectorized
``Series.str.extract`` over Arrow batches inside a pandas UDF that
returns a struct of captures plus a ``_matched`` flag. Multiple
patterns = first-match-wins: later patterns run only on rows the
earlier ones missed. Single-capture patterns should prefer the native
``F.regexp_extract`` lowering (``lower_single_capture``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd

GROK_FAILURE_TAG = "_grokparsefailure"

# Functionally-equivalent core pattern subset (written fresh; see module
# docstring). Keys match the public grok names so user patterns port 1:1.
CORE_PATTERNS: dict[str, str] = {
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?<![0-9.+-])(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+))",
    "NUMBER": r"%{BASE10NUM}",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:\\.|[^\\\"])*\"|'(?:\\.|[^\\'])*')",
    "QS": r"%{QUOTEDSTRING}",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IP": r"%{IPV4}",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "HTTPDUSER": r"(?:%{EMAILADDRESS}|%{USER})",
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "URIPROTO": r"[A-Za-z]([A-Za-z0-9+\-.]+)+",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "COMMONAPACHELOG": (
        r'%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} '
        r'\[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}'
        r'(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
        r'%{NUMBER:response} (?:%{NUMBER:bytes}|-)'
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
    # ---- numbers / ids ----
    "BASE16NUM": r"(?<![0-9A-Fa-f])(?:[+-]?(?:0x)?(?:[0-9A-Fa-f]+))",
    "BASE16FLOAT": r"\b(?<![0-9A-Fa-f.])(?:[+-]?(?:0x)?(?:(?:[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?)|(?:\.[0-9A-Fa-f]+)))\b",
    "BOOLEAN": r"(?:true|True|TRUE|false|False|FALSE)",
    # ---- mac addresses ----
    "CISCOMAC": r"(?:(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4})",
    "WINDOWSMAC": r"(?:(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2})",
    "COMMONMAC": r"(?:(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2})",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    # ---- ipv6 (grouped/compressed/v4-mapped forms) ----
    "IPV6": (
        r"(?:(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4})"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){1,7}:)"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4})"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){1,5}(?::[0-9A-Fa-f]{1,4}){1,2})"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){1,4}(?::[0-9A-Fa-f]{1,4}){1,3})"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){1,3}(?::[0-9A-Fa-f]{1,4}){1,4})"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){1,2}(?::[0-9A-Fa-f]{1,4}){1,5})"
        r"|(?:[0-9A-Fa-f]{1,4}:(?::[0-9A-Fa-f]{1,4}){1,6})"
        r"|(?::(?:(?::[0-9A-Fa-f]{1,4}){1,7}|:))"
        r"|(?:::(?:[fF]{4}:)?%{IPV4}))"
    ),
    # ---- filesystem / tty / uri ----
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "TTY": r"(?:/dev/(?:pts|tty(?:[pq])?)(?:\w+)?(?:/\w+)?)",
    "WINPATH": r"(?:[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "URIHOSTPORT": r"%{IPORHOST}(?::%{POSINT})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    # ---- dates / times (long tail) ----
    "MONTHNUM2": r"(?:0[1-9]|1[0-2])",
    "ISO8601_SECOND": r"(?:%{SECOND}|60)",
    "TZ": r"(?:[A-Z]{3,4}|[PMCE][SD]T|UTC)",
    "NUMTZ": r"[+-]\d{4}",
    "DATE": r"(?:%{DATE_US}|%{DATE_EU})",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "DATESTAMP_RFC822": r"%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822": r"%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "DATESTAMP_EVENTLOG": r"%{YEAR}%{MONTHNUM2}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}",
    # ---- syslog family (linux-syslog pattern file equivalents) ----
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "SYSLOGBASE2": r"(?:%{SYSLOGTIMESTAMP:timestamp}|%{TIMESTAMP_ISO8601:timestamp8601}) (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource}+(?: %{SYSLOGPROG}:|)",
    "SYSLOGLINE": r"%{SYSLOGBASE2} %{GREEDYDATA:message}",
    "SYSLOGPAMSESSION": r"%{SYSLOGBASE} (?:%{DATA:pam_module}\()?%{DATA:pam_caller}\): session %{WORD:pam_session_state} for user %{USERNAME:username}(?: by %{GREEDYDATA:pam_by})?",
    "CRON_ACTION": r"[A-Z ]+",
    "CRONLOG": r"%{SYSLOGBASE} \(%{USER:user}\) %{CRON_ACTION:action} \(%{DATA:message}\)",
    # rfc5424 structured syslog
    "SYSLOG5424PRI": r"<%{NONNEGINT:syslog5424_pri}>",
    "SYSLOG5424SD": r"\[%{DATA}\]+",
    "SYSLOG5424BASE": r"%{SYSLOG5424PRI}%{NONNEGINT:syslog5424_ver} +(?:%{TIMESTAMP_ISO8601:syslog5424_ts}|-) +(?:%{IPORHOST:syslog5424_host}|-) +(?:%{NOTSPACE:syslog5424_app}|-) +(?:%{NOTSPACE:syslog5424_proc}|-) +(?:%{NOTSPACE:syslog5424_msgid}|-) +(?:%{SYSLOG5424SD:syslog5424_sd}|-|)",
    "SYSLOG5424LINE": r"%{SYSLOG5424BASE} +%{GREEDYDATA:syslog5424_msg}",
    # ---- java / jvm logs ----
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAFILE": r"(?:[a-zA-Z$_0-9. -]+)",
    "JAVAMETHOD": r"(?:(?:<(?:cl)?init>)|[a-zA-Z$_][a-zA-Z$_0-9]*)",
    "JAVASTACKTRACEPART": r"\s+at %{JAVACLASS:class}\.%{JAVAMETHOD:method}\(%{JAVAFILE:file}(?::%{INT:line})?\)",
    "JAVATHREAD": r"(?:[A-Z]{2}-Processor[\d]+)",
    "JAVALOGMESSAGE": r"(?:.*)",
    "CATALINA_DATESTAMP": r"%{MONTH} %{MONTHDAY}, %{YEAR} %{HOUR}:%{MINUTE}:%{SECOND} (?:AM|PM)",
    "CATALINALOG": r"%{CATALINA_DATESTAMP:timestamp} %{JAVACLASS:class} %{JAVALOGMESSAGE:logmessage}",
    "TOMCAT_DATESTAMP": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY} %{HOUR}:%{MINUTE}:%{SECOND}(?:[,.]%{NONNEGINT})? ?%{ISO8601_TIMEZONE}?",
    "TOMCATLOG": r"%{TOMCAT_DATESTAMP:timestamp} \| %{LOGLEVEL:level} \| %{JAVACLASS:class} - %{JAVALOGMESSAGE:logmessage}",
    # ---- haproxy (http frontend log) ----
    "HAPROXYTIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})",
    "HAPROXYDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{HAPROXYTIME}\.%{INT}",
    "HAPROXYCAPTUREDREQUESTHEADERS": r"%{DATA:captured_request_headers}",
    "HAPROXYCAPTUREDRESPONSEHEADERS": r"%{DATA:captured_response_headers}",
    "HAPROXYHTTPBASE": (
        r"%{IP:client_ip}:%{INT:client_port} \[%{HAPROXYDATE:accept_date}\] "
        r"%{NOTSPACE:frontend_name} %{NOTSPACE:backend_name}/%{NOTSPACE:server_name} "
        r"%{INT:time_request}/%{INT:time_queue}/%{INT:time_backend_connect}/%{INT:time_backend_response}/%{NOTSPACE:time_duration} "
        r"%{INT:http_status_code} %{NOTSPACE:bytes_read} %{DATA:captured_request_cookie} %{DATA:captured_response_cookie} "
        r"%{NOTSPACE:termination_state} %{INT:actconn}/%{INT:feconn}/%{INT:beconn}/%{INT:srvconn}/%{NOTSPACE:retries} "
        r"%{INT:srv_queue}/%{INT:backend_queue}(?: \{%{HAPROXYCAPTUREDREQUESTHEADERS}\})?(?: \{%{HAPROXYCAPTUREDRESPONSEHEADERS}\})? "
        r'"%{GREEDYDATA:http_request}"'
    ),
    "HAPROXYHTTP": r"(?:%{SYSLOGTIMESTAMP:syslog_timestamp}|%{TIMESTAMP_ISO8601:timestamp8601}) %{IPORHOST:syslog_server} %{SYSLOGPROG}: %{HAPROXYHTTPBASE}",
    # ---- misc infra ----
    "HTTPDERROR_DATE": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    "HTTPD20_ERRORLOG": r"\[%{HTTPDERROR_DATE:timestamp}\] \[%{LOGLEVEL:loglevel}\] (?:\[client %{IPORHOST:clientip}\] )?%{GREEDYDATA:errormsg}",
    "REDISTIMESTAMP": r"%{MONTHDAY} %{MONTH} %{TIME}",
    "REDISLOG": r"\[%{POSINT:pid}\] %{REDISTIMESTAMP:timestamp} \* ",
    "RUBY_LOGLEVEL": r"(?:DEBUG|FATAL|ERROR|WARN|INFO)",
    "RUBY_LOGGER": r"[DFEWI], \[%{TIMESTAMP_ISO8601:timestamp} #%{POSINT:pid}\] *%{RUBY_LOGLEVEL:loglevel} -- +%{DATA:progname}: %{GREEDYDATA:message}",
    "NAGIOSTIME": r"\[%{NUMBER:nagios_epoch}\]",
    "ELB_URIPATHPARAM": r"%{URIPATH:path}(?:%{URIPARAM:params})?",
    "ELB_URI": r"%{URIPROTO:proto}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST:urihost})?(?:%{ELB_URIPATHPARAM})?",
    # ---- aws access logs ----
    "ELB_REQUEST_LINE": r"(?:%{WORD:verb} %{ELB_URI:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})",
    "ELB_ACCESS_LOG": (
        r"%{TIMESTAMP_ISO8601:timestamp} %{NOTSPACE:elb} %{IP:clientip}:%{INT:clientport} "
        r"(?:(?:%{IP:backendip}:?:%{INT:backendport})|-) %{NUMBER:request_processing_time} "
        r"%{NUMBER:backend_processing_time} %{NUMBER:response_processing_time} "
        r"%{INT:response} %{INT:backend_response} %{INT:received_bytes} %{INT:bytes} "
        r'"%{ELB_REQUEST_LINE}"'
    ),
    "S3_REQUEST_LINE": r"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})",
    "S3_ACCESS_LOG": (
        r"%{WORD:owner} %{NOTSPACE:bucket} \[%{HTTPDATE:timestamp}\] %{IP:clientip} "
        r"%{NOTSPACE:requester} %{NOTSPACE:request_id} %{NOTSPACE:operation} %{NOTSPACE:key} "
        r'(?:"%{S3_REQUEST_LINE}"|-) (?:%{INT:response}|-) (?:-|%{NOTSPACE:error_code}) '
        r"(?:%{INT:bytes}|-) (?:%{INT:object_size}|-) (?:%{INT:request_time_ms}|-) "
        r'(?:%{INT:turnaround_time_ms}|-) (?:"%{DATA:referrer}"|-) (?:"%{DATA:agent}"|-)'
    ),
    # ---- mongodb 3.x+ ----
    "MONGO3_SEVERITY": r"\w",
    "MONGO3_COMPONENT": r"%{WORD}",
    "MONGO3_LOG": (
        r"%{TIMESTAMP_ISO8601:timestamp} %{MONGO3_SEVERITY:severity} "
        r"%{MONGO3_COMPONENT:component}\s+(?:\[%{DATA:context}\])? %{GREEDYDATA:message}"
    ),
    # ---- exim ----
    "EXIM_MSGID": r"[0-9A-Za-z]{6}-[0-9A-Za-z]{6}-[0-9A-Za-z]{2}",
    "EXIM_FLAGS": r"(?:<=|=>|->|\*>|\*\*|==|<>)",
    "EXIM_DATE": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY} %{TIME}",
    "EXIM_PID": r"\[%{POSINT:pid}\]",
    # ---- postgresql stderr log prefix ----
    "POSTGRESQL": r"%{DATESTAMP:timestamp} %{TZ:tz} %{DATA:user_id} %{GREEDYDATA:connection_id} %{POSINT:pid}",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(\w+))?\}")
_MAX_DEPTH = 50


@dataclass
class CompiledGrok:
    regex: re.Pattern
    # ordered mapping: output field → (regex group names to coalesce, type)
    fields: dict[str, tuple[list[str], str]] = field(default_factory=dict)


def _sanitize(name: str) -> str:
    # semantic names may be [a][b] refs; flatten for struct-field safety
    return re.sub(r"[^\w]", "_", name.strip("[]").replace("][", "_"))


def compile_grok(
    pattern: str, extra_patterns: dict[str, str] | None = None
) -> CompiledGrok:
    """Expand ``%{NAME:field:type}`` refs into one Python regex."""
    lib = dict(CORE_PATTERNS)
    if extra_patterns:
        lib.update(extra_patterns)

    fields: dict[str, tuple[list[str], str]] = {}
    counter = [0]

    def expand(pat: str, depth: int) -> str:
        if depth > _MAX_DEPTH:
            raise ValueError("grok pattern recursion too deep")

        def repl(m: re.Match) -> str:
            name, semantic, typ = m.group(1), m.group(2), m.group(3)
            if name not in lib:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            inner = expand(lib[name], depth + 1)
            if semantic:
                out_field = _sanitize(semantic)
                counter[0] += 1
                gname = f"g{counter[0]}"
                groups, old_typ = fields.get(out_field, ([], "string"))
                groups.append(gname)
                fields[out_field] = (groups, typ or old_typ)
                return f"(?P<{gname}>{inner})"
            return f"(?:{inner})"

        return _GROK_REF.sub(repl, pat)

    expanded = expand(pattern, 0)
    return CompiledGrok(regex=re.compile(expanded), fields=fields)


_PD_CAST = {"int": "Int64", "float": "Float64", "string": "object"}
_SPARK_TYPE = {"int": "long", "float": "double", "string": "string"}


def grok_output_schema(compiled: list[CompiledGrok]) -> str:
    """DDL schema of the capture struct (union over patterns + _matched)."""
    cols: dict[str, str] = {}
    for cg in compiled:
        for fname, (_, typ) in cg.fields.items():
            cols.setdefault(fname, _SPARK_TYPE.get(typ, "string"))
    parts = [f"`{n}` {t}" for n, t in cols.items()]
    parts.append("`_matched` boolean")
    return ", ".join(parts)


def grok_extract_batch(
    s: pd.Series, compiled: list[CompiledGrok], keep_empty_captures: bool = False,
    break_on_match: bool = True,
) -> pd.DataFrame:
    """Extraction over a string Series → capture frame.

    Vectorized: each pattern runs one ``str.extract``. break_on_match
    (grok.rb default true): each row stops at its first matching
    pattern. break_on_match=false: EVERY pattern runs on every row and
    captures accumulate (earlier patterns win per-field coalesce).
    """
    all_fields: dict[str, str] = {}
    for cg in compiled:
        for fname, (_, typ) in cg.fields.items():
            all_fields.setdefault(fname, typ)

    out = pd.DataFrame(index=s.index)
    for fname in all_fields:
        out[fname] = pd.Series([None] * len(s), index=s.index, dtype="object")
    matched = pd.Series(False, index=s.index)

    todo = s.notna() & ~matched
    for cg in compiled:
        if break_on_match and not todo.any():
            break
        if not break_on_match:
            todo = s.notna()
        sub = s[todo].astype("string")
        # extract: one column per regex group
        ext = sub.str.extract(cg.regex)
        hit = ext.notna().any(axis=1)
        # a regex with zero capture groups can still match
        if not cg.fields:
            hit = sub.str.contains(cg.regex, regex=True).fillna(False)
        hit_idx = hit[hit].index
        for fname, (groups, _typ) in cg.fields.items():
            vals = None
            for g in groups:
                col = ext[g] if g in ext.columns else pd.Series(dtype="object")
                if vals is None:
                    vals = col
                else:
                    # grok same-name alternation: only one side matched →
                    # coalesce. dissect %{+name} append: both matched →
                    # join with a space (the append default).
                    both = vals.notna() & col.notna()
                    vals = vals.fillna(col)
                    if both.any():
                        vals.loc[both] = vals[both].astype(str) + " " + col[both].astype(str)
            if vals is not None:
                new_vals = vals[hit].astype("object")
                if break_on_match:
                    out.loc[hit_idx, fname] = new_vals
                else:
                    # accumulate: earlier patterns win per field
                    cur = out.loc[hit_idx, fname]
                    fill_idx = cur[cur.isna()].index
                    out.loc[fill_idx, fname] = new_vals.loc[fill_idx]
        matched.loc[hit_idx] = True
        todo = s.notna() & ~matched

    if not keep_empty_captures:
        for fname in all_fields:
            empties = out[fname] == ""
            if empties.any():
                out.loc[empties, fname] = None

    for fname, typ in all_fields.items():
        if typ == "int":
            out[fname] = pd.to_numeric(out[fname], errors="coerce").astype("Int64")
        elif typ == "float":
            out[fname] = pd.to_numeric(out[fname], errors="coerce").astype("Float64")
    out["_matched"] = matched
    return out


def struct_extract_udf(compiled: list[CompiledGrok], keep_empty_captures: bool = False,
                       break_on_match: bool = True):
    """(pandas_udf, schema_ddl) applying compiled patterns.

    Shared executor for grok and dissect stages.
    """
    from pyspark.sql.functions import pandas_udf

    schema = grok_output_schema(compiled)

    @pandas_udf(f"struct<{schema}>")
    def _extract(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in batches:
            yield grok_extract_batch(s, compiled, keep_empty_captures, break_on_match)

    return _extract, schema


def grok_udf(patterns: list[str], extra_patterns: dict[str, str] | None = None,
             keep_empty_captures: bool = False, break_on_match: bool = True):
    """Build (pandas_udf, output_schema_ddl) for a grok match spec."""
    compiled = [compile_grok(p, extra_patterns) for p in patterns]
    return struct_extract_udf(compiled, keep_empty_captures, break_on_match)


def lower_single_capture(pattern: str) -> tuple[str, str] | None:
    """If the grok spec is one literal-anchored single capture, return
    (python_regex, field) so the stage can use native F.regexp_extract
    instead of a UDF. Conservative: only when exactly one semantic
    capture exists and the expansion has exactly one group."""
    cg = compile_grok(pattern)
    if len(cg.fields) != 1:
        return None
    fname, (groups, typ) = next(iter(cg.fields.items()))
    if len(groups) != 1 or typ != "string":
        return None
    # rewrite the single named group to an anonymous group for Spark's
    # Java regex (named groups differ between re and java.util.regex)
    java_pat = cg.regex.pattern.replace(f"(?P<{groups[0]}>", "(")
    if "(?P<" in java_pat or "(?<!" in java_pat or "(?!" in java_pat:
        return None  # lookarounds are fine in Java but keep it conservative
    return java_pat, fname


def lower_multi_capture(
    pattern: str, extra_patterns: dict[str, str] | None = None
) -> tuple[str, list[tuple[str, int, str]]] | None:
    """General native lowering: one grok pattern → a Java regex plus
    [(field, group_index, type)] so the stage can evaluate it as k
    ``F.regexp_extract`` calls + one ``rlike`` — all whole-stage-codegen
    JVM (measured ~2× a single vectorized-Python pass at 12 captures in
    steady state, and far cheaper cold: no Python workers, no Arrow).

    Returns None (→ the pandas path) when any field aggregates several
    groups (same-name alternation needs coalesce-with-append semantics)
    or the expansion carries syntax Java's regex dialect lacks. Dialect
    caveat (same stance as lower_single_capture, documented SURVEY §7):
    java.util.regex and Python ``re`` agree on this library's constructs
    for ASCII input; \\w/\\b differ on non-ASCII letters.
    """
    cg = compile_grok(pattern, extra_patterns)
    if not cg.fields:
        return None
    plan: list[tuple[str, int, str]] = []
    java_pat = cg.regex.pattern
    for fname, (groups, typ) in cg.fields.items():
        if len(groups) != 1:
            return None
        plan.append((fname, cg.regex.groupindex[groups[0]], typ))
        java_pat = java_pat.replace(f"(?P<{groups[0]}>", "(")
    if "(?P" in java_pat:  # leftover Python-only named syntax/backrefs
        return None
    return java_pat, plan
