"""Text cleaning / PII scrubbing — the intake normalization pass a
web-corpus pipeline runs before any dedup or quality scoring.

All transforms are single-pass JVM-side ``regexp_replace`` chains
(whole-stage codegen, no UDF) with DuckDB twins; the patterns are
written in the common Java-regex/RE2 subset so both engines agree
byte-for-byte: explicit whitespace classes (``\\s`` differs between the
engines on vertical tab), ASCII character classes, no lookaround, no
backreferences. Masking order is URL -> email -> IPv4 so an address
inside a URL is consumed by the URL mask first, then whitespace runs
collapse and the result is trimmed.

At 100 TB this is a narrow map over the text scan — no shuffle, no
Python; it composes in front of prepare_corpus stages for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# patterns valid and identical in Java regex (Spark) and RE2 (DuckDB)
WS_RUN = r"[ \t\n\r\f]+"
URL = r"https?://[^ \t\n\r\f]+"
EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
CTRL = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"

URL_MASK = "<URL>"
EMAIL_MASK = "<EMAIL>"
IP_MASK = "<IP>"


def _esc(pattern: str, spark: bool) -> str:
    """Pattern -> SQL string literal body. Spark SQL literals process
    C-style backslash escapes, so backslashes double; DuckDB regular
    literals pass backslashes through verbatim."""
    if spark:
        pattern = pattern.replace("\\", "\\\\")
    return pattern.replace("'", "''")


def scrub_expr(spark: bool, col: str = "text") -> str:
    """SQL expression: mask URL/email/IPv4, strip control chars,
    collapse whitespace runs, trim."""
    flags = "" if spark else ", 'g'"
    t = col
    for pat, rep in (
        (URL, URL_MASK),
        (EMAIL, EMAIL_MASK),
        (IPV4, IP_MASK),
        (CTRL, ""),
    ):
        t = f"regexp_replace({t}, '{_esc(pat, spark)}', '{rep}'{flags})"
    t = f"trim(regexp_replace({t}, '{_esc(WS_RUN, spark)}', ' '{flags}))"
    return t


def count_expr(spark: bool, pattern: str, col: str = "text") -> str:
    """Occurrence count of ``pattern`` in ``col``, BIGINT both engines."""
    if spark:
        return f"cast(regexp_count({col}, '{_esc(pattern, True)}') as bigint)"
    return (
        f"cast(len(regexp_extract_all({col}, '{_esc(pattern, False)}')) "
        f"as bigint)"
    )


def scrub_text(docs: DataFrame, col: str = "text") -> DataFrame:
    """Append ``text_clean`` + per-doc mask counts (n_urls, n_emails,
    n_ips). Counts are taken on the RAW text (an email swallowed by a
    URL mask still counts as an email — they answer "what does this doc
    contain", not "what did the chain replace")."""
    return docs.select(
        "*",
        F.expr(scrub_expr(True, col)).alias("text_clean"),
        F.expr(count_expr(True, URL, col)).alias("n_urls"),
        F.expr(count_expr(True, EMAIL, col)).alias("n_emails"),
        F.expr(count_expr(True, IPV4, col)).alias("n_ips"),
    )


def scrub_oracle_sql(from_clause: str = "documents", col: str = "text") -> str:
    return (
        f"SELECT *, {scrub_expr(False, col)} AS text_clean, "
        f"{count_expr(False, URL, col)} AS n_urls, "
        f"{count_expr(False, EMAIL, col)} AS n_emails, "
        f"{count_expr(False, IPV4, col)} AS n_ips FROM {from_clause}"
    )


def dirty_text_expr(spark: bool, col: str = "text", id_col: str = "doc_id") -> str:
    """Deterministic adversarial decoration for the CONTRACT fixture:
    the synthetic corpus contains no URLs/emails/IPs/whitespace runs
    (plain word soup), so the contract query decorates each doc with
    id-derived instances of every pattern — identically in both engines
    — before scrubbing. The operator itself takes any text column."""
    sid = f"cast({id_col} as string)" if spark else f"CAST({id_col} AS VARCHAR)"
    oct3 = (
        f"cast({id_col} % 256 as string)"
        if spark
        else f"CAST({id_col} % 256 AS VARCHAR)"
    )
    return (
        f"concat({col}, ' see https://ex-', {sid}, "
        f"'.example.com/a?q=', {sid}, "
        f"' mail user.', {sid}, '@mail-', {sid}, '.example.org', "
        f"chr(9), 'host 10.', {oct3}, '.0.1 ', chr(10), chr(10), "
        f"' padded', chr(13), ' tail')"
    )
