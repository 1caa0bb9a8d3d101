"""Deterministic sampling operators (SURVEY Phase 6 — corpus
rebalancing for training-data pipelines).

Random sampling is useless for a reproducible pipeline (and untestable
against an oracle); the production pattern is *hash sampling*: derive
a uniform value from a stable content hash and threshold it. Identical
input ⇒ identical sample, on any engine, any partitioning, any day.

Portability trick: both engines agree bit-for-bit on ``md5(text)`` as
a lowercase hex string, and hex strings compare lexicographically in
digit order — so ``substr(md5(x),1,4) < '2000'`` is a portable
Bernoulli(0x2000/0x10000 = 12.5%) gate with no integer parsing at all.

Two samplers, one tagged result:

- **bernoulli**: per-stratum *rate* sampling — downsample the dominant
  language harder (the corpus-rebalancing move). Pure per-row filter:
  zero shuffles, fully pushdown-friendly, trivially scale-safe.
- **fixed_k**: per-stratum *count* sampling — exactly k docs per
  stratum, selected by hash order (a deterministic reservoir). One
  partitioned window keyed by stratum; at 100 TB the partition count
  equals the stratum count, so pair it with a salted pre-top-k
  (per-partition row_number ≤ k before the final window) if strata
  are few and huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

# per-stratum Bernoulli thresholds on the first 4 hex chars of
# md5(text): en is downsampled ~2x harder than the tail languages.
EN_GATE = "1800"      # 0x1800/0x10000 ≈  9.4%
OTHER_GATE = "3000"   # 0x3000/0x10000 ≈ 18.8%
FIXED_K = 8


def hash_gate_key(col, salt: str = ""):
    """The shared 4-hex-char Bernoulli gate key: ``substr(md5(x),1,4)``
    over the column's bytes, optionally SALTED per operator.

    Why the salt exists: two samplers gating on the same unsalted
    ``md5(text)`` make statistically DEPENDENT decisions — a document
    passing one gate is disproportionately likely to pass the other
    (at equal rates they select the identical subset), so composed
    samplers stack bias instead of thinning independently. Folding a
    per-operator salt into the hash input re-keys the uniform draw, so
    differently-salted gates are independent: joint pass rate ==
    product of marginals (tests/test_operators.py pins this on the
    fixture). ``salt=""`` is bit-identical to the historical unsalted
    key, so default outputs (and the smp1 oracle row) are unchanged."""
    base = F.concat(col, F.lit(salt)) if salt else col
    return F.substring(F.md5(base.cast("binary")), 1, 4)


@register(
    "smp1_stratified_sample",
    f"""
    WITH h AS (
      SELECT doc_id, lang, substr(md5(text), 1, 4) AS hkey
      FROM documents
    )
    SELECT 'bernoulli' AS method, lang, doc_id, hkey
    FROM h
    WHERE hkey < CASE WHEN lang = 'en' THEN '{EN_GATE}'
                      ELSE '{OTHER_GATE}' END
    UNION ALL
    SELECT 'fixed_k' AS method, lang, doc_id, hkey
    FROM (
      SELECT lang, doc_id, hkey,
             row_number() OVER (PARTITION BY lang
                                ORDER BY hkey, doc_id) AS rn
      FROM h
    ) WHERE rn <= {FIXED_K}
    """,
    doc="Sampling (deterministic/stratified): hash-Bernoulli per-"
        "stratum rate sampling (en downsampled 2x harder — the corpus "
        "language-rebalancing move) UNION a fixed-k-per-stratum "
        "deterministic reservoir (row_number over hash order). The "
        "Bernoulli branch is a pure per-row filter (zero shuffles, "
        "predicate-pushdown friendly); the fixed-k branch is one "
        "window partitioned by stratum. md5-hex thresholds compare "
        "lexicographically identically on both engines — no integer "
        "parsing, bit-exact parity")
def stratified_sample(spark: SparkSession, sf_dir: str,
                      salt: str = "") -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "lang",
        hash_gate_key(F.col("text"), salt).alias("hkey"))
    gate = F.when(F.col("lang") == "en", F.lit(EN_GATE)) \
            .otherwise(F.lit(OTHER_GATE))
    bern = (h.filter(F.col("hkey") < gate)
            .select(F.lit("bernoulli").alias("method"),
                    "lang", "doc_id", "hkey"))
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    fixed = (h.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= FIXED_K)
             .select(F.lit("fixed_k").alias("method"),
                     "lang", "doc_id", "hkey"))
    return bern.unionByName(fixed)


def mixture_sample(docs: DataFrame, weights: dict,
                   stratum_col: str = "source",
                   text_col: str = "text",
                   default_rate: float = 1.0,
                   salt: str = "") -> DataFrame:
    """Deterministic MIXTURE sampling — the training-data mixing op:
    each stratum (source/domain/language) is repeated at its own rate,
    including rates above 1 ("epochs" over a high-quality source).

    rate r per stratum decomposes as ``floor(r)`` whole copies plus a
    Bernoulli(r - floor(r)) extra copy, gated on the same md5-hex
    threshold trick as smp1 (hex strings compare lexicographically in
    digit order, so the gate is engine-portable with no integer
    parsing). Identical input ⇒ identical sample AND identical copy
    multiplicity, any partitioning, any engine.

    Output = input columns + ``copy_idx`` (0-based). A rate of 0
    drops the stratum; strata absent from ``weights`` get
    ``default_rate``. The whole operator is a per-row map + explode —
    zero shuffles, scale-trivial; downstream shuffling (tx11 packing)
    is what randomizes copy placement.

    ``salt`` decorrelates this gate from other hash samplers over the
    same text (see :func:`hash_gate_key`) — pass a distinct salt
    whenever mixture sampling composes with another gate (the e2e
    training pipeline does); the default preserves historical output.
    """
    hkey = hash_gate_key(F.col(text_col), salt)

    whole = F.lit(int(default_rate))
    frac_gate = F.lit(f"{int((default_rate % 1.0) * 65536):04x}")
    for stratum, rate in weights.items():
        if rate < 0:
            raise ValueError(f"negative rate for {stratum!r}: {rate}")
        whole = F.when(F.col(stratum_col) == stratum,
                       F.lit(int(rate))).otherwise(whole)
        frac_gate = F.when(
            F.col(stratum_col) == stratum,
            F.lit(f"{int((rate % 1.0) * 65536):04x}")).otherwise(frac_gate)

    n_copies = (whole
                + F.when(hkey < frac_gate, F.lit(1)).otherwise(F.lit(0)))
    return (docs.withColumn("_n", n_copies)
            .filter(F.col("_n") > 0)
            .withColumn("copy_idx",
                        F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
            .drop("_n"))
