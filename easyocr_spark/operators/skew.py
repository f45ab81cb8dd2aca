"""Skew handling: salted replicated join (axis A of the north rule).

When a join key is pathologically hot (here: shared media_refs — the
duplicate-ref class means one ref can be referenced by millions of
spans at 10^12-doc scale) and the small side is too big to broadcast,
the classic fix is salting: the BIG side gets a uniform random-ish salt
in [0, S); the SMALL side is replicated S times, once per salt value;
the join key becomes (key, salt). One hot key's rows now land on S
different reducers instead of one.

AQE's skew-join splitting handles moderate skew automatically (enabled
in session.py); this operator is for the pathological tail where a
single key exceeds what one task should ever see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` with ``small`` on ``key`` with salt fan-out.

    Deterministic salt: hash of the big side's full row position proxy
    (xxhash64 of all columns) mod n_salts — uniform without requiring a
    unique id column. Result columns = big's columns + small's non-key
    columns (same contract as ``big.join(small, key)``).
    """
    # pmod, not abs-then-mod: abs(Long.MIN_VALUE) overflows and would
    # yield a negative salt that silently drops the row from an inner join
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    ).alias("_salt")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    joined = big_s.join(small_s, [key, "_salt"], how)
    return joined.drop("_salt")
