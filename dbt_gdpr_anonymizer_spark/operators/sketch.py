"""Deterministic, mergeable frequency/cardinality sketches.

At 100 TB the exact aggregates (``groupBy(token).count()``,
``countDistinct``) still run — they are linear shuffles — but two
pipeline-telemetry questions want CONSTANT-memory, mergeable state
instead: "which tokens are heavy, roughly how heavy?" (count-min
sketch, Cormode & Muthukrishnan 2005) and "how many distinct keys,
without a distinct shuffle?" (HyperLogLog, Flajolet et al. 2007).
Engine builtins exist (``approx_count_distinct`` is HLL++) but their
internals are engine-private, so their outputs can never be
hash-compared across engines and their state can never be merged with
a sketch built elsewhere. These twins are fully DETERMINISTIC — every
hash is the repo's md5-nibble idiom, every float fold has a pinned
sequential order — so a DuckDB oracle replays them bit-for-bit, and
the register/counter state is plain integer columns any engine can
merge (counters by ``+``, registers by ``max``).

No reference counterpart: tabodino/dbt-gdpr-anonymizer has no sketch
tier; this extends the LLM-pipeline telemetry surface (the
approx_distinct_sketch query certifies Spark's builtin HLL only
within an error band — these are exact-replayable).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.functions.text import words
from dbt_gdpr_anonymizer_spark.operators.caching import track_caches

__all__ = ["countmin_heavy_hitters", "hll_distinct"]


def _nibble_bucket(h: Column, n_buckets: int) -> Column:
    """First 5 md5 hex nibbles parsed positionally, mod ``n_buckets`` —
    the established cross-engine bucket idiom (_hbucket_sql twin)."""
    return (F.conv(F.substring(h, 1, 5), 16, 10).cast("bigint") % n_buckets).cast(
        "int"
    )


def countmin_heavy_hitters(
    docs: DataFrame,
    *,
    depth: int = 4,
    width: int = 256,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "cm",
) -> DataFrame:
    """X169 count-min sketch heavy hitters (Cormode & Muthukrishnan
    2005): a ``depth × width`` counter grid where row ``i`` buckets
    token ``w`` at ``md5(salt‖i‖':'‖w)`` (5-nibble parse mod width) and
    the point estimate is ``min_i grid[i][bucket_i(w)]`` — an upper
    bound on the true count that collisions can only inflate, never
    deflate (the one-sided error CM guarantees). Released: the top
    ``k`` tokens by estimate with the exact count alongside, so the
    overestimate is *visible* per row.

    Scale shape: ONE corpus pass (explode → map-side-combined token
    counts); the grid is built FROM that vocab-bounded table — summing
    per-token counts into buckets is associative, so this is
    bit-identical to streaming the corpus through the sketch, without
    the depth× corpus blow-up (at 100 TB you'd sketch per partition
    and merge grids by ``+``; the grid here IS that mergeable state).
    The grid (depth·width rows) broadcasts into the estimate lookup —
    a broadcast HASH equi-join on (row, bucket), not a nested loop.
    The top-k release is orderBy+limit (TakeOrdered partial top-k per
    partition), no global window. Everything is INTEGER-exact — no
    float anywhere.

    Returns ``(token, exact_count BIGINT, cm_estimate BIGINT)``,
    ordered ``(cm_estimate DESC, token)``, ``k`` rows.
    """
    wc = (
        docs.select(F.explode(words(text_col)).alias("_w"))
        .filter(F.col("_w") != "")
        .groupBy("_w")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .persist()
    )
    h = F.md5(
        F.concat(
            F.lit(salt), F.col("_i").cast("string"), F.lit(":"), F.col("_w")
        )
    )
    keyed = wc.select(
        "_w",
        "_c",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("_i"),
    ).select("_w", "_c", "_i", _nibble_bucket(h, width).alias("_b"))
    grid = keyed.groupBy("_i", "_b").agg(F.sum("_c").alias("_cnt"))
    est = (
        keyed.join(F.broadcast(grid), ["_i", "_b"])
        .groupBy("_w")
        .agg(
            F.min("_cnt").cast("long").alias("cm_estimate"),
            # _c is constant per token; max() just carries it through
            F.max("_c").cast("long").alias("exact_count"),
        )
    )
    out = (
        est.select(
            F.col("_w").alias("token"), "exact_count", "cm_estimate"
        )
        .orderBy(F.desc("cm_estimate"), "token")
        .limit(k)
    )
    return track_caches(out, wc)


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    b: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """X170 deterministic HyperLogLog distinct estimate (Flajolet,
    Fusy, Gandouet & Meunier 2007) per group: value ``v`` hashes to
    ``md5(salt‖':'‖v)``; the first ``b/4`` hex nibbles pick one of
    ``m = 2^b`` registers and the NEXT 13 nibbles form a 52-bit window
    whose leading-zero run sets ``rho`` (position of the first 1 bit;
    53 if the window is all zeros). Register ``j`` keeps
    ``M_j = max(rho)`` — duplicates hash identically, so NO distinct
    shuffle ever happens: the whole pass is one map-side-combined
    ``(group, j) → max`` aggregate, and registers from different
    shards/engines merge by ``max`` (the property the engine-private
    builtin sketches cannot offer). Estimate
    ``E = α_m·m²/Σ_j 2^(−M_j)`` with the standard small-range linear
    counting correction ``m·ln(m/V)`` when ``E ≤ 2.5m`` and ``V`` (the
    zero-register count) is positive; the large-range 32-bit-hash
    correction is unnecessary — the 52-bit window never saturates at
    any real cardinality.

    Float determinism: ``2^(−M_j)`` terms are exact binary powers,
    folded SEQUENTIALLY in register order (j = 0 … m−1, initial 0.0) —
    the oracle replays the identical IEEE chain via
    ``list_reduce(list_prepend(0.0, …))``; ``α_m·m²`` is computed ONCE
    driver-side and embedded as the same literal in both engines. The
    integer register witnesses (``register_sum``, ``register_max``,
    ``n_zero_registers``) pin the full register state exactly, so a
    single-bit register divergence breaks the hash even where the
    floored estimate would absorb it.

    Constraints: ``b`` must be a multiple of 4 (nibble-aligned) and
    ``m = 2^b ≥ 128`` (the α constant below is the m ≥ 128 one).

    NULL values are ignored (``COUNT(DISTINCT …)`` semantics — both
    engines agree on that, and a NULL would otherwise poison the md5
    concat). Returns ``(group_cols…, hll_distinct BIGINT,
    n_zero_registers BIGINT, register_sum BIGINT, register_max
    BIGINT)``.
    """
    if b % 4 != 0 or (1 << b) < 128:
        raise ValueError("b must be a multiple of 4 with 2^b >= 128")
    m = 1 << b
    alpha_m2 = 0.7213 / (1.0 + 1.079 / m) * m * m

    df = df.filter(F.col(value_col).isNotNull())
    h = F.md5(
        F.concat(F.lit(f"{salt}:"), F.col(value_col).cast("string"))
    )
    j = F.conv(F.substring(h, 1, b // 4), 16, 10).cast("int")
    bits = F.lpad(
        F.conv(F.substring(h, b // 4 + 1, 13), 16, 2), 52, "0"
    )
    pos = F.instr(bits, "1")
    rho = F.when(pos == 0, F.lit(53)).otherwise(pos)

    regs = (
        df.select(*group_cols, j.alias("_j"), rho.alias("_r"))
        .groupBy(*group_cols, "_j")
        .agg(F.max("_r").alias("_m"))
    )
    per_group = regs.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_j"), F.col("_m")))
        ).alias("_regs"),
        F.sum("_m").cast("long").alias("register_sum"),
        F.max("_m").cast("long").alias("register_max"),
        F.count(F.lit(1)).alias("_npresent"),
    )
    term = lambda t: F.pow(  # noqa: E731 — exact binary power 2^(−M_t)
        F.lit(0.5),
        F.coalesce(
            F.element_at(F.col("_regs"), t.cast("int")), F.lit(0)
        ).cast("double"),
    )
    s = F.aggregate(
        F.transform(F.sequence(F.lit(0), F.lit(m - 1)), term),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    v = (F.lit(m) - F.col("_npresent")).cast("bigint")
    e_raw = F.lit(alpha_m2) / F.col("_s")
    e = F.when(
        (e_raw <= F.lit(2.5 * m)) & (F.col("_v") > 0),
        F.lit(float(m))
        * F.log(F.lit(float(m)) / F.col("_v").cast("double")),
    ).otherwise(e_raw)
    return (
        per_group.withColumn("_s", s)
        .withColumn("_v", v)
        .select(
            *group_cols,
            F.floor(e).cast("bigint").alias("hll_distinct"),
            F.col("_v").alias("n_zero_registers"),
            "register_sum",
            "register_max",
        )
    )
