"""Skew-mitigated join (SURVEY §4 scale notes; prompt's salting
technique made explicit).

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled`` is on in ``session.py``), but
it only splits *partitions*, not a single pathological key inside one.
``salted_join`` is the manual fix for that case: the probe side gets a
deterministic salt in ``[0, k)``, the build side is replicated k ways,
and the join key becomes (key, salt) — one hot key fans out across k
tasks instead of melting one executor.

Correct by construction: every probe row meets exactly one replica of
each matching build row, so the result multiset equals the plain inner
join (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                salt_buckets: int = 8,
                salt_on: str | None = None) -> DataFrame:
    """Inner equi-join on ``key`` with the probe side salted and the
    build side replicated ``salt_buckets`` ways.

    ``salt_on``: column whose hash spreads the probe rows (defaults to
    a per-row monotonic id — any high-cardinality column works and a
    deterministic one keeps runs reproducible).
    """
    spread = (F.col(salt_on) if salt_on
              else F.monotonically_increasing_id())
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.hash(spread), F.lit(salt_buckets)))
    replicated_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0),
                                      F.lit(salt_buckets - 1))))
    out = salted_probe.join(replicated_build,
                            on=[key, "_salt"], how="inner")
    return out.drop("_salt")
