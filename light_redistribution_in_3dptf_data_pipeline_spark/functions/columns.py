"""Reusable column-expression builders (SURVEY §2.8).

Everything here returns ``pyspark.sql.Column`` trees built from JVM
built-ins — no Python UDFs — so every use stays inside whole-stage
codegen and Catalyst can constant-fold / push down around them. These
are the engine's "scalar function library": the query modules and
operators compose them instead of re-deriving the expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Re-exported generators (defined alongside their oracle-checked
# queries, shared here as the public surface).
from ..queries.generators import (  # noqa: F401
    DEG2RAD, euler_zyx_matrix_cols, pose_grid_df)


def seconds_between(later: Column, earlier: Column) -> Column:
    """F6: signed wall-clock seconds between two timestamps, exact to
    the microsecond (the reference's ``(t2-t1).total_seconds()``,
    point3d_transformation.py:42-43)."""
    return ((F.unix_micros(later) - F.unix_micros(earlier)).cast("double")
            / F.lit(1000000.0))


def l2_distance(du: Column, dv: Column) -> Column:
    """F9: Euclidean norm of a 2-vector of deltas
    (extrinsic_calibration.py:212)."""
    return F.sqrt(du * du + dv * dv)


def homogeneous_transform_cols(T, x: Column, y: Column, z: Column
                               ) -> dict[str, Column]:
    """F12: apply the top 3 rows of a 4×4 homogeneous transform to a
    3-vector as closed-form expressions (no UDF). ``T`` is a 3×4
    nested sequence of floats. Returns {'x': ..., 'y': ..., 'z': ...}
    (point3d_transformation.py:109-120)."""
    out = {}
    for name, (r0, r1, r2, t) in zip(("x", "y", "z"), T):
        out[name] = (F.lit(r0) * x + F.lit(r1) * y + F.lit(r2) * z
                     + F.lit(t))
    return out


def whitespace_tokens(text: Column) -> Column:
    """Whitespace tokenizer: the LLM-pipeline token-count baseline."""
    return F.split(F.trim(text), r"\s+")


def ngram_shingles(toks: Column, n: int = 3,
                   distinct: bool = True) -> Column:
    """Word n-gram shingles of a token array, built entirely inside
    the row: indexed transform (+ array_distinct when ``distinct``).
    A pure flat map — zero shuffles — unlike window-sort formulations.
    ``distinct=False`` keeps positional duplicates (needed by
    repetition metrics, where the duplicate *count* is the signal).

    NOTE: pass a *materialized column reference* (select the token
    array first), not the ``split`` expression itself — a lambda over
    an unmaterialized expression re-evaluates it per element (O(L²)).
    """
    gram = F.transform(
        toks, lambda x, i: F.concat_ws(
            " ", *([x] + [F.get(toks, i + k) for k in range(1, n)])))
    sliced = F.slice(gram, F.lit(1),
                     F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0)))
    return F.array_distinct(sliced) if distinct else sliced


def nano_components(vec: Column) -> Column:
    """Float vector → exact BIGINT nano-unit components via
    ``floor(x*1e9 + 0.5)`` — pure IEEE multiply/add/floor, so the
    integers are bit-identical in ANY engine. This is the canonical
    fixed-point conversion for cross-engine-compared queries (SQL
    restatement: ``CAST(floor(CAST(x AS DOUBLE)*1000000000.0 + 0.5)
    AS BIGINT)``)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(1000000000.0)
                               + F.lit(0.5)).cast("bigint"))


def decimal_components(vec: Column, precision: str = "decimal(18,9)"
                       ) -> Column:
    """Cast a float vector to fixed-precision decimal components.

    CAVEAT (why registered queries use :func:`nano_components`
    instead): double→DECIMAL rounds the shortest decimal repr in
    Spark (BigDecimal.valueOf) but the exact binary value in DuckDB —
    within one ulp of a scale-9 half boundary the engines produce
    components one unit apart (observed on the sf0.1 fixture).
    Fine single-engine; not engine-portable."""
    return F.transform(vec, lambda x: x.cast("double").cast(precision))


def decimal_dot(u: Column, v: Column) -> Column:
    """Exact dot product of two DECIMAL(18,9) component arrays (from
    ``decimal_components``) as a DOUBLE. Folds with an explicit
    DECIMAL(30,18) accumulator: |component| ≤ 1 so products fit
    (20,18) and 64-term sums fit (30,18); the casts keep Spark's
    lambda result type equal to the accumulator type."""
    zero = F.lit(0).cast("decimal(30,18)")
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: (x * y).cast("decimal(20,18)")),
        zero,
        lambda acc, x: (acc + x).cast("decimal(30,18)")).cast("double")


# --- Curation-stage text scrubbing (LLM-pipeline extension) ---------
# Redaction runs longest-pattern-first so an email inside a URL is
# consumed by the URL rule, never double-counted. All pure JVM regex
# (regexp_extract_all / regexp_replace) — codegen'd, no Python in the
# hot path, safe to run over 100 TB of documents as a map-only stage.

URL_RE = r"https?://\S+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"

_PII_RULES = (
    ("url", URL_RE, "<URL>"),
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact_pii_cols(text: Column) -> dict[str, Column]:
    """PII/URL scrubbing: returns ``clean_text`` with urls/emails/
    ipv4s/phone-runs replaced by typed placeholder tokens, plus a
    BIGINT match count per category (counted *before* its own
    replacement, on the text already cleaned by earlier rules, so
    categories never overlap)."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat, token in _PII_RULES:
        out[f"n_{name}"] = F.size(
            F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).cast("bigint")
        cur = F.regexp_replace(cur, pat, token)
    out["clean_text"] = cur
    return out


def normalize_text(text: Column) -> Column:
    """Canonical form for dedup/fingerprint keys: strip control
    chars, collapse whitespace runs to single spaces, trim, lowercase.
    Idempotent (normalize(normalize(x)) == normalize(x))."""
    stripped = F.regexp_replace(text, r"[\x00-\x1F\x7F]", " ")
    collapsed = F.regexp_replace(stripped, r"\s+", " ")
    return F.lower(F.trim(collapsed))
