"""Relational operators beyond the reference's surface (SURVEY §2.3
lists these as absent there): window functions, rollup, as-of join,
range join — implemented Spark-first for scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_n_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, n: int, descending: bool = True
) -> DataFrame:
    """row_number window — single shuffle on the group key."""
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    # deterministic tiebreak on all group+order context is caller's job;
    # add the first remaining column as a stable tiebreak
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .drop("rn")
    )


def pack_by_budget(
    df: DataFrame,
    part_col: str,
    order_col: str,
    weight_col: str,
    budget: float,
    shard_col: str = "shard",
) -> DataFrame:
    """Pack rows into fixed-budget shards per partition key — the
    training-data op that turns documents into ~budget-token shards.

    shard = floor(exclusive-prefix-sum(weight) / budget) over the
    deterministic (part, order) sequence: each shard's total stays
    within budget + one row's overshoot, the standard streaming-pack
    contract. The window is PARTITIONED by part_col, so the running sum
    parallelizes across partitions (languages, sources, date buckets);
    a single global cumsum would serialize 100 TB through one task —
    callers wanting one global sequence should pre-bucket and offset.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    excl_prefix = F.sum(weight_col).over(w) - F.col(weight_col)
    return df.withColumn(
        shard_col, F.floor(excl_prefix / F.lit(budget)).cast("long")
    )


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting for skewed keys.

    Phase 1 groups on (key, salt) so a hot key spreads over `salt`
    reducers; phase 2 merges the partials. `aggs` maps column -> one of
    'sum' | 'count' | 'min' | 'max'. Spark's map-side partial
    aggregation already handles mild skew — this is for the pathological
    hot-key case (AQE skew-join handles the join analogue).
    """
    phase1_aggs = []
    phase2_aggs = []
    for col, how in aggs.items():
        out = f"{col}_{how}"
        if how == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif how == "sum":
            phase1_aggs.append(F.sum(col).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif how == "min":
            phase1_aggs.append(F.min(col).alias(out))
            phase2_aggs.append(F.min(out).alias(out))
        elif how == "max":
            phase1_aggs.append(F.max(col).alias(out))
            phase2_aggs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"unsupported agg {how}")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(*phase1_aggs)
    return partial.groupBy(*key_cols).agg(*phase2_aggs)


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Explicit broadcast join for small dimension tables — makes the
    'small dims broadcast' contract visible in the plan regardless of
    statistics quality."""
    return fact.join(F.broadcast(dim), on, how)


def _payload_tiebreak(df: DataFrame, cols: list[str]) -> Column:
    """Deterministic per-row tiebreak for as-of ties: xxhash64 over the
    HASHABLE payload columns (map-bearing columns are excluded — Spark
    cannot hash or order maps). Two right rows sharing (by, ts) then
    resolve by max hash: a pure function of row content, so the winner
    is stable across runs, partitionings, and cluster shapes (the
    driver's hash_match gate relies on exactly this). Residual
    nondeterminism only if two tied rows also share every hashable
    column (identical payloads, or payloads differing only inside a
    map) — documented, not detectable without orderability.
    """
    dtypes = dict(df.dtypes)
    hashable = [c for c in cols if "map<" not in dtypes[c]]
    if not hashable:
        return F.lit(0).cast("long")
    return F.xxhash64(*[F.col(c) for c in hashable])


def _time_micros(df: DataFrame, on: str) -> Column:
    """Epoch-microsecond view of an as-of time column, by dtype.

    timestamp -> unix_micros; date -> midnight (session tz) cast to
    timestamp first; numeric (int/long/float/double/decimal) ->
    interpreted as epoch SECONDS — so ``bucket_seconds`` /
    ``tolerance_seconds`` keep their units — scaled to micros (integer-
    exact while the micros value stays under 2^53, i.e. seconds <
    ~9.0e9 — any real epoch is ~1.7e9). Anything else raises a
    clear TypeError up front instead of unix_micros' opaque
    AnalysisException mid-plan (ADVICE r12: the round-12 signed-micros
    rework silently narrowed the accepted types to TimestampType).
    """
    dt = dict(df.dtypes)[on]
    if dt == "timestamp":
        return F.unix_micros(F.col(on))
    if dt == "timestamp_ntz" or dt == "date":
        # parquet timestamps commonly read back as TIMESTAMP_NTZ, which
        # unix_micros rejects; the cast interprets the wall clock in the
        # session time zone (UTC in get_spark() — a DST-observing
        # session tz can fold/skip an hour at transitions, so keep the
        # session on UTC for deterministic as-of ordering)
        return F.unix_micros(F.col(on).cast("timestamp"))
    if dt in ("tinyint", "smallint", "int", "bigint", "float", "double") or dt.startswith(
        "decimal"
    ):
        return (F.col(on).cast("double") * 1_000_000).cast("long")
    raise TypeError(
        f"asof time column {on!r} has dtype {dt}; expected timestamp, "
        "date, or a numeric epoch-seconds column"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    suffix: str = "_right",
    bucket_seconds: int | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right.on <= left.on within the same `by` group
    (``direction="backward"``, the default), or the EARLIEST right row
    with right.on >= left.on (``direction="forward"`` — "the next
    event after this one", e.g. purchase → next support ticket).
    ``tolerance_seconds`` additionally bounds the match distance:
    fills farther than the tolerance come back NULL, exactly pandas
    merge_asof's contract.

    Spark-first implementation via union + window last_value instead of
    a per-row correlated lookup: one shuffle on `by`, ordered scan —
    scales linearly, no broadcast nested loop. (DuckDB expresses the
    backward case as ASOF JOIN; that is the correctness oracle.)
    Internally time is SIGNED epoch microseconds (negated for
    forward), so one ordered-scan implementation serves both
    directions — including the bucketed skew lever, whose carry-in
    machinery is direction-agnostic in signed time. ``on`` may be a
    timestamp, a date, or a numeric epoch-SECONDS column (see
    `_time_micros`); other dtypes raise TypeError up front.

    Tie semantics (round 12): when two right rows share (by, on), the
    winner is the one with the greatest payload hash (`_payload_tiebreak`)
    — a deterministic, partition-layout-independent choice, identical
    between the plain and bucketed shapes. Pass ``tie_break`` (round
    13, VERDICT r12 sharp-edge #1) to name a right column whose MAX
    value wins instead — with the right id column this matches
    `asof_range_profile`'s tie convention exactly, so the two
    operators agree on tied inputs; like `right_id` there, the caller
    promises the column distinguishes tied rows. NULL `by` keys follow
    equi-join semantics: a NULL-keyed right row matches nothing and a
    NULL-keyed left row gets a NULL fill (matching the DuckDB ASOF
    JOIN oracle, whose equality predicate never matches NULL).

    ``bucket_seconds`` is the SKEW lever (round 11): the plain window
    partitions on the bare `by` key, so one hub key (a power user with
    100M events) becomes a single sort task at 100 TB. With a bucket
    width, the window partitions on (by, time-bucket) — bounded rows
    per partition — and correctness across bucket borders comes from a
    CARRY-IN row per (by, bucket): the latest (in signed time) right
    row of all EARLIER buckets, computed on the per-bucket tails (one
    tiny window over #buckets-sized rows per key, then joined back).
    Semantics are identical to the unbucketed shape
    (equivalence-tested); ties at a bucket boundary stay interior
    because a carry-in's timestamp is strictly below the bucket start.

    Choosing the width: per-partition rows ≈ hub-key events per bucket
    + 1 carry row per occupied bucket, so pick width ≈ (target rows per
    task) / (hub key's peak events per second); too narrow a width
    makes carry rows (one per occupied bucket per key) the dominant
    cost for the LONG TAIL of quiet keys. See PLANS.md §33 for the
    measured hub-key probe.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    sign = 1 if direction == "backward" else -1
    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c not in (on, by)]
    # NULL-keyed right rows can never match under equi semantics; drop
    # them up front so the NULL window partition (Spark groups NULL
    # keys together) cannot leak fills into NULL-keyed left rows
    right = right.where(F.col(by).isNotNull())
    l_struct_t = left.select(F.struct(*lcols).alias("x")).schema["x"].dataType
    if tie_break is not None:
        tb_type = dict(right.dtypes).get(tie_break)
        if tb_type is None or "map<" in tb_type:
            raise ValueError(
                f"tie_break column {tie_break!r} must be an orderable "
                "right column"
            )
        rtb = F.col(tie_break)
    else:
        tb_type = "bigint"
        rtb = _payload_tiebreak(right, rcols)
    # fill payload carries its own signed time (__st) so the tolerance
    # check can measure the match distance after the window fill
    rv = F.struct(
        (_time_micros(right, on) * sign).alias("__st"),
        F.struct(*rcols).alias("__r"),
    )
    rv_t = right.select(rv.alias("x")).schema["x"].dataType
    l_tag = left.select(
        F.lit(1).alias("__is_left"),
        (_time_micros(left, on) * sign).alias("__t"),
        F.col(by).alias("__by"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(rv_t).alias("__rv"),
        F.lit(None).cast(tb_type).alias("__tb"),
    )
    r_tag = right.select(
        F.lit(0).alias("__is_left"),
        (_time_micros(right, on) * sign).alias("__t"),
        F.col(by).alias("__by"),
        F.lit(None).cast(l_struct_t).alias("__l"),
        rv.alias("__rv"),
        rtb.alias("__tb"),
    )
    unioned = l_tag.unionByName(r_tag)
    part_cols = ["__by"]
    if bucket_seconds is not None:
        # signed micros bucket identically to floor(unix_timestamp/w)
        # in the backward case (floor-division composition) and stay
        # time-contiguous in the forward (negated) case
        bkt = F.floor(F.col("__t") / (bucket_seconds * 1_000_000))
        unioned = unioned.withColumn("__bkt", bkt)
        part_cols = ["__by", "__bkt"]
        # per (by, bucket) tail of the RIGHT rows: latest (t, tb, rv)
        # by (t, tb) — max_by keyed on scalars only, so the payload
        # struct never needs to be orderable (map-typed columns work);
        # the (t, tb) key matches the window's tie convention exactly.
        # The carry-in for bucket b is the latest tail over all buckets
        # < b — per-bucket tail times are strictly increasing across
        # buckets (bucket = floor(t/width)), so "latest" is simply the
        # LAST non-null tail in bucket order. Carry rows must land in
        # EVERY occupied bucket (incl. left-only buckets with no right
        # rows), so the bucket list comes from both sides; the
        # cumulative window runs over #buckets-sized rows per key, not
        # data (rangeBetween, not rows: left-only buckets carry NULL
        # tails that must not truncate the lookback)
        tails = (
            r_tag.withColumn("__bkt", bkt)
            .groupBy("__by", "__bkt")
            .agg(
                F.max_by(
                    F.struct(F.col("__t"), F.col("__tb"), F.col("__rv")),
                    F.struct(F.col("__t"), F.col("__tb")),
                ).alias("__tail")
            )
        )
        all_bkts = unioned.select("__by", "__bkt").distinct()
        wb = (
            Window.partitionBy("__by")
            .orderBy(F.col("__bkt").asc())
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            all_bkts.join(tails, ["__by", "__bkt"], "left")
            .withColumn("__cin", F.last("__tail", ignorenulls=True).over(wb))
            .where(F.col("__cin").isNotNull())
            .select(
                F.lit(0).alias("__is_left"),
                F.col("__cin.__t").alias("__t"),
                "__by",
                F.lit(None).cast(l_struct_t).alias("__l"),
                F.col("__cin.__rv").alias("__rv"),
                F.col("__cin.__tb").alias("__tb"),
                "__bkt",
            )
        )
        unioned = unioned.unionByName(carry)
    # right rows sort before left rows at equal timestamps so a
    # same-instant right row is visible to the left row (<= / >=
    # semantics); __tb makes the order TOTAL across right rows sharing
    # (by, t) — F.last then deterministically picks the max-hash row,
    # the same row the bucketed tail's max_by(…, struct(t, tb)) keeps
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__last", F.last("__rv", ignorenulls=True).over(w))
    out = filled.where(F.col("__is_left") == 1)
    fill = F.col("__last")
    if tolerance_seconds is not None:
        # match distance in signed space = left __t - fill __st =
        # |left.on - right.on| in micros for either direction
        fill = F.when(
            (F.col("__t") - F.col("__last.__st"))
            <= int(tolerance_seconds * 1_000_000),
            F.col("__last"),
        )
    out = out.withColumn("__fill", fill)
    sel = [F.col(f"__l.{c}").alias(c) for c in lcols]
    sel += [
        F.col(f"__fill.__r.{c}").alias(f"{c}{suffix}" if c in lcols else c)
        for c in rcols
    ]
    return out.select(*sel)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: str,
    lower_seconds: int,
    upper_seconds: int,
    count_name: str = "n_in_range",
) -> DataFrame:
    """For each left row, count right rows (same `by`) with
    right_ts in [left_ts - lower, left_ts + upper].

    Implemented as a bucketed equi-join: both sides bucket timestamps
    into `width = lower+upper` bins, left explodes to the neighboring
    bins, join on (by, bin) then exact range filter — avoids the
    broadcast-nested-loop a plain interval join would produce, and
    shuffles on (by, bin) which stays balanced at scale.

    Duplicate left rows are preserved with INDEPENDENT counts (round
    12): the fold-back groups on a per-row uid attached before the bin
    explode, not on the raw left columns — grouping on content alone
    would both collapse N identical left rows to one AND inflate its
    count N-fold.
    """
    width = lower_seconds + upper_seconds
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / width)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / width)
    l2 = (
        left.withColumn("__luid", F.monotonically_increasing_id())
        .withColumn("__bin", F.explode(F.array(lb - 1, lb, lb + 1)))
        .withColumn("__lt", F.unix_timestamp(F.col(left_ts)))
    )
    r2 = right.select(
        F.col(by).alias("__rby"),
        rb.alias("__bin"),
        F.unix_timestamp(F.col(right_ts)).alias("__rt"),
    )
    joined = l2.join(
        r2,
        (F.col(by) == F.col("__rby"))
        & (l2["__bin"] == r2["__bin"])
        & (F.col("__rt") >= F.col("__lt") - lower_seconds)
        & (F.col("__rt") <= F.col("__lt") + upper_seconds),
        "left",
    )
    return (
        joined.groupBy("__luid", *[F.col(c) for c in left.columns])
        .agg(F.count("__rt").alias(count_name))
        .drop("__luid")
    )


def asof_range_profile(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_id: str,
    lower_seconds: int,
    upper_seconds: int,
    asof_name: str = "asof_id",
    count_name: str = "n_in_range",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Fused as-of + range-count in ONE window pass: for each left row,
    the latest right row with right.on <= left.on (same `by` group) AND
    the count of right rows with unix_timestamp(right.on) in
    [unix_timestamp(left.on) - lower, ... + upper] (both inclusive,
    second-truncated — exactly `range_join_count`'s bounds).

    Composing `asof_join` + `range_join_count` + a join on the left key
    pays two independent scans of each input, each op's shuffles, AND a
    final key shuffle to stitch the halves. This fused shape pays TWO
    exchanges total: one window shuffle on `by` (the union carries one
    click row plus three O(1) probe rows per left row), one groupBy on
    the left columns. Semantics are asserted equal to the composition
    (tests) and to the DuckDB ASOF JOIN + correlated-count oracle.

    Boundary mechanics: the cumulative click count at a probe row
    counts clicks strictly BEFORE it in (ts, rank) order, so the low
    probe sits at timestamp_seconds(lt - lower) (clicks at exactly the
    low bound sort after it — included in the window count) and the
    high probe at timestamp_seconds(lt + upper + 1) (clicks at exactly
    the high bound sort before it — included). The as-of probe sits at
    the left row's FULL timestamp with ties ordered right-before-left,
    matching `asof_join`'s <= semantics.

    Tie + NULL-key semantics (round 12): right rows sharing (by, on)
    resolve deterministically to the MAX `right_id` — the same row the
    bucketed carry-in's max(struct(ts, id)) tail keeps, so the plain
    and bucketed shapes agree on ties at a bucket border. (`asof_join`
    has no id column, so its deterministic tie-break is the payload
    hash; on tied inputs the two operators may pick different — but
    each individually stable — winners.) NULL `by` rows follow equi-join
    semantics: NULL-keyed right rows match nothing; NULL-keyed left
    rows return (NULL asof, 0 count), exactly what the composed
    asof_join + range_join_count produces. Duplicate left rows are
    PRESERVED (one output row each, identical profiles) via a per-row
    uid attached before the probe explode.

    ``bucket_seconds`` is the same hub-key skew lever as `asof_join`'s
    (round 11): the window partitions on (by, time-bucket) — every row
    (click or probe) buckets by its OWN sort timestamp — and one
    carry-in row per occupied (by, bucket) restores cross-border
    state: __incr = the click count of all earlier buckets (so the
    cumulative count at any probe stays global) and __rid = their
    latest click (so the as-of fill stays global), sorted first via
    rank -1 (a carry summarizes strictly-earlier rows). Row-exact vs
    the unbucketed shape in tests. Width guidance: see `asof_join`'s
    docstring and PLANS.md §33.
    """
    lcols = list(left.columns)
    lt = F.unix_timestamp(F.col(on))
    lstruct = F.struct(*lcols).alias("__l")
    null_l = F.lit(None).cast(
        left.select(F.struct(*lcols).alias("x")).schema["x"].dataType
    ).alias("__l")
    right = right.where(F.col(by).isNotNull())
    probes = left.withColumn(
        "__luid", F.monotonically_increasing_id()
    ).select(
        F.col(by).alias("__by"),
        lstruct,
        F.col("__luid"),
        F.explode(
            F.array(
                F.struct(
                    F.timestamp_seconds(lt - lower_seconds).alias("__t"),
                    F.lit(0).alias("__rank"),
                    F.lit("lo").alias("__kind"),
                ),
                F.struct(
                    F.timestamp_seconds(lt + upper_seconds + 1).alias("__t"),
                    F.lit(0).alias("__rank"),
                    F.lit("hi").alias("__kind"),
                ),
                F.struct(
                    F.col(on).alias("__t"),
                    F.lit(2).alias("__rank"),
                    F.lit("asof").alias("__kind"),
                ),
            )
        ).alias("__p"),
    ).select(
        "__by", "__l", "__luid",
        F.col("__p.__t").alias("__t"),
        F.col("__p.__rank").alias("__rank"),
        F.col("__p.__kind").alias("__kind"),
        F.lit(0).cast("long").alias("__incr"),
        F.lit(None).cast(dict(right.dtypes)[right_id]).alias("__rid"),
    )
    clicks = right.select(
        F.col(by).alias("__by"),
        null_l,
        F.lit(None).cast("long").alias("__luid"),
        F.col(on).alias("__t"),
        F.lit(1).alias("__rank"),
        F.lit(None).cast("string").alias("__kind"),
        # long, not int: a carry-in row's __incr is an earlier-bucket
        # click COUNT, which can pass 2^31 for one hub key at 100 TB
        F.lit(1).cast("long").alias("__incr"),
        F.col(right_id).alias("__rid"),
    )
    unioned = probes.unionByName(clicks)
    part_cols = ["__by"]
    if bucket_seconds is not None:
        bkt = F.floor(F.unix_timestamp(F.col("__t")) / bucket_seconds)
        unioned = unioned.withColumn("__bkt", bkt)
        part_cols = ["__by", "__bkt"]
        tails = (
            clicks.withColumn("__bkt", bkt)
            .groupBy("__by", "__bkt")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.max(F.struct(F.col("__t"), F.col("__rid"))).alias(
                    "__tail"
                ),
            )
        )
        all_bkts = unioned.select("__by", "__bkt").distinct()
        wb = (
            Window.partitionBy("__by")
            .orderBy(F.col("__bkt").asc())
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        joined = all_bkts.join(tails, ["__by", "__bkt"], "left")
        # per-bucket tail timestamps strictly increase across buckets,
        # so the latest earlier-bucket tail is the LAST non-null one in
        # bucket order; within a bucket max(struct(__t, __rid)) keeps
        # the max-id row at a timestamp tie — the window's convention
        carry = (
            joined.withColumn(
                "__cn", F.coalesce(F.sum("__n").over(wb), F.lit(0))
            )
            .withColumn("__cin", F.last("__tail", ignorenulls=True).over(wb))
            .where(F.col("__cn") > 0)
            .select(
                "__by",
                null_l,
                F.lit(None).cast("long").alias("__luid"),
                F.timestamp_seconds(
                    F.col("__bkt") * bucket_seconds
                ).alias("__t"),
                F.lit(-1).alias("__rank"),
                F.lit(None).cast("string").alias("__kind"),
                F.col("__cn").cast("long").alias("__incr"),
                F.col("__cin.__rid").alias("__rid"),
                "__bkt",
            )
        )
        unioned = unioned.unionByName(carry)
    # __rid makes the sort total where it matters: only click rows can
    # tie in (__t, __rank) (probe ranks 0/2 vs click rank 1, one carry
    # per partition at rank -1), and F.last then deterministically
    # fills the MAX right_id — the same row the bucketed tail keeps
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("__t").asc(), F.col("__rank").asc(), F.col("__rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = (
        unioned
        .withColumn("__cum", F.sum("__incr").over(w))
        .withColumn("__last", F.last("__rid", ignorenulls=True).over(w))
        .where(F.col("__kind").isNotNull())
    )
    kind = F.col("__kind")
    return (
        scanned.groupBy("__l", "__luid")
        .agg(
            F.max(F.when(kind == "asof", F.col("__last"))).alias(asof_name),
            (
                F.max(F.when(kind == "hi", F.col("__cum")))
                - F.max(F.when(kind == "lo", F.col("__cum")))
            ).alias(count_name),
        )
        .select(
            *[F.col(f"__l.{c}").alias(c) for c in lcols],
            asof_name,
            count_name,
        )
    )


def sample_by_weight(
    df: DataFrame,
    key_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "mix",
) -> DataFrame:
    """Deterministic per-source downsampling for corpus mixing — the
    "source weights" step of training-data assembly (e.g. keep 50% of
    web, 100% of books). A row is kept iff
    hash60(seed || id) % 1e6 < rate(key) * 1e6, so the decision is a
    pure map-side filter: reproducible across runs and engines (the
    md5-derived `hash60` is SQL-portable), no shuffle, no sampling
    state, and scale-independent — the same doc is kept at every scale
    factor. Rates outside the dict fall back to `default_rate`.
    """
    from graphula_spark.operators.dedup import hash60

    rate = None
    for k, v in sorted(rates.items()):
        cond = F.col(key_col) == k
        rate = F.when(cond, F.lit(float(v))) if rate is None else rate.when(
            cond, F.lit(float(v))
        )
    rate = (
        rate.otherwise(F.lit(float(default_rate)))
        if rate is not None
        else F.lit(float(default_rate))
    )
    u = hash60(
        F.concat(F.lit(seed), F.col(id_col).cast("string"))
    ) % F.lit(1000000)
    return df.where(u < (rate * 1000000).cast("long"))


def shuffle_deterministic(
    df: DataFrame, id_col: str, seed: int = 0
) -> DataFrame:
    """Deterministic pseudorandom global shuffle — the "shuffle the
    corpus before training" step, reproducible across runs and resumable
    mid-epoch (the order is a pure function of (seed, id), not of
    partitioning or cluster size).

    Sort key = xxhash64(seed, id). Spark's orderBy compiles to a range
    exchange (sampled range boundaries) + per-partition sort: no single
    point of serialization, so the plan holds at 100 TB; changing the
    seed reshuffles every epoch without rewriting data. Ties (64-bit
    hash collisions) are broken by id so the order is total.
    """
    h = F.xxhash64(F.lit(seed).cast("long"), F.col(id_col))
    return df.orderBy(h.asc(), F.col(id_col).asc())
