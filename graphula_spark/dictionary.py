"""Dictionary encoding: RDF term string <-> 63-bit positive long id.

Scheme mirrors the reference (core/.../dictionary/Dictionary.scala:34-37):

    id = xxhash64(term_bytes) & Long.MaxValue

with a collision-exception path for distinct strings that hash to the
same id (reference: Dictionary.scala:187-211 allocates sequential ids
from an AtomicLong; a distributed engine cannot cheaply hand out a
global counter, so we deterministically re-salt the hash instead —
same observable contract: every distinct string gets a unique positive
id, the first-seen/lexicographically-smallest string keeps the raw
hash id).

Blank nodes: the reference gives blank nodes ids with *no* dictionary
entry and synthesizes ``_:$id`` on decode (Dictionary.scala:103-119).
We store blank-node labels (``_:x``) as ordinary dictionary terms —
round-trip behavior is identical within a load session — and keep the
reference's decode fallback ``coalesce(value, '_:' || id)`` for ids
absent from the dictionary.

Spark-first notes:
- encode/decode are *joins* against the dict DataFrame, not RPCs; at
  100 TB the dict is itself distributed and the encode join shuffles
  on the term string (or broadcasts when small).
- ``F.xxhash64`` is the same XXH64 family the reference uses via
  net.openhft; seed 42 (Spark's default). Ids therefore differ from
  the reference numerically — irrelevant, ids never leave the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType
from pyspark.sql.window import Window

#: Long.MaxValue mask — keeps ids positive (reference: Dictionary.scala:36)
HASH_MASK = (1 << 63) - 1

DICT_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("value", StringType(), False),
    ]
)


def term_id_col(col):
    """Column expression for the primary (pre-collision-check) id."""
    return F.xxhash64(col).bitwiseAND(F.lit(HASH_MASK))


class Dictionary:
    """An immutable (id, value) mapping as a DataFrame.

    Reference parity: core/.../dictionary/Dictionary.scala
    (add:144-161, apply(String):125-139, apply(Long):103-119).
    """

    def __init__(
        self,
        spark: SparkSession,
        df: DataFrame,
        bucketed_df: DataFrame | None = None,
        id_buckets: int | None = None,
        exceptions: list[tuple[str, int]] | None = None,
    ):
        self.spark = spark
        self.df = df
        # optional id-bucketed parquet view (persisted stores): decode
        # joins include the partition column so Spark's dynamic partition
        # pruning reads only the buckets the result ids actually hit —
        # the 100 TB-dictionary decode path (see decode_col)
        self.bucketed_df = bucketed_df
        self.id_buckets = id_buckets
        # driver-side memo for query-constant resolution: query planning
        # repeatedly resolves a handful of constants; caching avoids one
        # Spark job per query (negative results cached as None)
        self._term_cache: dict[str, int | None] = {}
        self._nrows: int | None = None
        # (value, id) pairs whose id is NOT the raw term hash — the
        # collision re-salt exceptions (reference: Dictionary.scala's
        # exception map, :187-211). None = unknown, computed lazily;
        # False = pathologically many, encode falls back to join.
        self._exceptions: list[tuple[str, int]] | None | bool = exceptions

    #: dictionaries below this row count get an explicit broadcast hint
    #: on decode joins — robust against conservative session-level
    #: autoBroadcastJoinThreshold defaults; above it, decode is a
    #: shuffle join by design (the 100 TB dict is itself distributed)
    BROADCAST_MAX_ROWS = 5_000_000

    #: incremental-union batches below this row count get explicit
    #: broadcast hints in the against-the-dictionary joins (novelty
    #: anti-join + id-clash probe): Catalyst cannot size the batch
    #: statically, so without the hint those joins plan SortMergeJoin
    #: and RESHUFFLE THE WHOLE DICTIONARY to add a handful of terms —
    #: probed at a 20M-term dictionary: 102 MB shuffled to register
    #: ONE term (tools/probe_r8.py). Strings are heavier than ids, so
    #: the gate is more conservative than BROADCAST_MAX_ROWS.
    BROADCAST_NEW_TERMS_MAX_ROWS = 500_000

    def _broadcastable(self) -> bool:
        if self._nrows is None:
            self._nrows = self.df.count()
        return self._nrows < Dictionary.BROADCAST_MAX_ROWS

    @classmethod
    def empty(cls, spark: SparkSession) -> "Dictionary":
        from graphula_spark.literal import empty_df

        return cls(spark, empty_df(spark, "id long, value string"), exceptions=[])

    @staticmethod
    def _assign_ids(
        terms: DataFrame,
        existing: DataFrame | None,
        max_rounds: int = 12,
        n_terms: int | None = None,
    ) -> tuple[DataFrame, bool]:
        """Assign a unique id to every term in `terms` (one 'value'
        column, distinct, non-null), disjoint from `existing` ids.

        Shared by build and incremental union (the round-1 union clash
        path used a single fixed salt and never verified post-salt
        uniqueness). Iterated ranked re-salting: per round, ids that are
        duplicated within the set or taken by an existing entry are
        re-hashed with a (round, rank) salt; the lexicographically
        smallest holder of a free id keeps it. Collisions are ~2^-63 in
        the real 63-bit space, so the happy path is exactly one cheap
        emptiness probe over a count aggregate — the window only ever
        runs over the (tiny) collided subset.

        Returns (df, clean): clean=True means NO term was re-salted —
        every id is the raw term hash, so the caller can record an
        empty collision-exception list without any extra scan.

        ``n_terms`` (when the caller already counted the batch) gates
        the id-clash probe's join order: a known-small batch is
        BROADCAST against the streaming existing-id scan, so an
        incremental union never shuffles the existing dictionary
        (tools/probe_r8.py: the old shape shuffled 102 MB of ids to
        register one term at 20M entries).
        """
        from pyspark import StorageLevel

        from graphula_spark.scratch import track

        result = track(
            terms.withColumn("id", term_id_col(F.col("value"))).persist(
                StorageLevel.MEMORY_AND_DISK
            )
        )
        # the collision probe below materializes the full (id, value)
        # set; persisting it means the store write / decode joins reuse
        # that computation instead of re-scanning + re-shuffling the
        # source terms — one pass over the data, not two (spills rather
        # than recomputes at 100 TB)
        #
        # existing ids are UNIQUE by the dictionary invariant (this very
        # function guarantees it) — the old .distinct() here reshuffled
        # the whole dictionary on every incremental union for nothing
        ex_ids = existing.select("id") if existing is not None else None
        small = (
            n_terms is not None
            and n_terms <= Dictionary.BROADCAST_NEW_TERMS_MAX_ROWS
        )
        for rnd in range(max_rounds):
            dup_ids = (
                result.groupBy("id")
                .agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("c") > 1)
                .select("id")
            )
            bad_ids = dup_ids
            if ex_ids is not None:
                if small:
                    # stream the dictionary past a broadcast of the
                    # batch's ids — zero dictionary shuffle; output ids
                    # are unique (they come from ex_ids)
                    clash_ids = ex_ids.join(
                        F.broadcast(result.select("id")), "id", "left_semi"
                    )
                else:
                    clash_ids = (
                        result.join(ex_ids, "id", "left_semi")
                        .select("id")
                        .distinct()
                    )
                bad_ids = dup_ids.unionByName(clash_ids).distinct()
            if bad_ids.isEmpty():
                return result.select("id", "value"), rnd == 0
            bad = result.join(F.broadcast(bad_ids), "id", "left_semi")
            good = result.join(F.broadcast(bad_ids), "id", "left_anti")
            if ex_ids is not None:
                # only the existing ids IN the collided set matter, and
                # that set is tiny — semi-reduce ex_ids first instead of
                # shuffling the whole dictionary into the left join
                ex_hits = ex_ids.join(
                    F.broadcast(bad_ids), "id", "left_semi"
                ).withColumn("__ex", F.lit(1))
                bad = bad.join(F.broadcast(ex_hits), "id", "left")
            else:
                bad = bad.withColumn("__ex", F.lit(None).cast("int"))
            w = Window.partitionBy("id").orderBy("value")
            resalted = (
                bad.withColumn("rank", F.row_number().over(w))
                .withColumn(
                    "id",
                    F.when(
                        (F.col("rank") == 1) & F.col("__ex").isNull(),
                        F.col("id"),
                    ).otherwise(
                        term_id_col(
                            F.concat(
                                F.col("value"),
                                F.lit("\x01"),
                                F.lit(f"{rnd}:"),
                                F.col("rank").cast("string"),
                            )
                        )
                    ),
                )
                .select("id", "value")
            )
            # Only reached when a collision actually exists (~2^-63 per
            # pair in production). Eagerly truncate lineage so repeated
            # rounds don't stack window+join stages into one deep plan.
            prev = result
            result = good.select("id", "value").unionByName(resalted).localCheckpoint()
            prev.unpersist()
        raise RuntimeError(
            f"dictionary id assignment did not converge in {max_rounds} rounds"
        )

    @classmethod
    def build(cls, spark: SparkSession, terms: DataFrame) -> "Dictionary":
        """Build a dictionary from a one-column DataFrame of term strings.

        Collision handling via `_assign_ids` (ranked deterministic
        re-salting). The empty string is always a valid entry (the
        reference pre-seeds it, Dictionary.scala:66-76).
        """
        col = terms.columns[0]
        distinct = (
            terms.select(F.col(col).alias("value"))
            .where(F.col("value").isNotNull())
            .distinct()
        )
        assigned, clean = cls._assign_ids(distinct, None)
        return cls(spark, assigned, exceptions=[] if clean else None)

    def union(self, other_terms: DataFrame) -> "Dictionary":
        """Extend with new terms (incremental load); existing ids stable.

        Fresh ids are assigned with the same iterated ranked-salt scheme
        as build, with the existing id set excluded — post-salt
        uniqueness is guaranteed by the fixed point, not assumed.

        100 TB shape: the batch is counted once (persisted, so the
        count is the materialization the joins reuse), and a
        known-small batch runs both against-the-dictionary joins with
        the DICTIONARY STREAMING — novelty via semi-join the overlap
        out of the dictionary (batch broadcast) then anti-join the
        batch against that batch-bounded overlap; a direct
        `batch ANTI dict` can never broadcast (only the right side of
        LEFT ANTI broadcasts, and that is the dictionary) and
        reshuffled all 20M entries to add one term (tools/probe_r8.py).
        """
        from pyspark import StorageLevel

        from graphula_spark.scratch import track

        cand = track(
            other_terms.select(F.col(other_terms.columns[0]).alias("value"))
            .where(F.col("value").isNotNull())
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_new = cand.count()
        if n_new <= Dictionary.BROADCAST_NEW_TERMS_MAX_ROWS:
            present = self.df.join(F.broadcast(cand), "value", "left_semi")
            new_terms = cand.join(F.broadcast(present), "value", "left_anti")
        else:
            new_terms = cand.join(self.df, "value", "left_anti")
        fresh, clean = Dictionary._assign_ids(
            new_terms, self.df, n_terms=n_new
        )
        exc = None
        if clean and isinstance(self._exceptions, list):
            exc = list(self._exceptions)
        return Dictionary(self.spark, self.df.unionByName(fresh), exceptions=exc)

    # -- encode ----------------------------------------------------------
    #: collected-exception safety valve: past this many collision
    #: re-salts (never happens with 63-bit hashing short of adversarial
    #: input), encode falls back to the full dictionary join
    EXC_MAX_ROWS = 1_000_000

    def _get_exceptions(self) -> list[tuple[str, int]] | None:
        """The (value, id) pairs whose id differs from the raw term hash
        — the collision re-salts. ~0 entries by 63-bit hashing; None
        signals a pathological count (encode then join-falls-back)."""
        if self._exceptions is False:
            return None
        if self._exceptions is None:
            rows = (
                self.df.where(term_id_col(F.col("value")) != F.col("id"))
                .limit(Dictionary.EXC_MAX_ROWS + 1)
                .collect()
            )
            if len(rows) > Dictionary.EXC_MAX_ROWS:
                self._exceptions = False
                return None
            self._exceptions = [(r["value"], r["id"]) for r in rows]
        return self._exceptions

    def encode_col(self, df: DataFrame, col: str, out: str) -> DataFrame:
        """Encode one string column to its id column — a PURE MAP, not a
        join: id = xxhash64(term) by construction, patched by a
        broadcast of the (tiny, usually empty) collision-exception set.
        This is the reference's hash-is-the-id contract
        (Dictionary.scala:34-37 + exception map :187-211) and the reason
        a 100 TB load never shuffles its triples against the dictionary.

        Terms absent from the dictionary encode to their would-be hash
        id, which matches nothing in the graph (2^-63 collision odds) —
        same observable semantics as the former NULL encoding for the
        delete/probe paths. Query constants resolve through
        `lookup_terms` instead and still report missing terms exactly
        (unknown constant ⇒ empty result,
        reference: GraphulaStageGenerator.scala:61-68).
        """
        exc = self._get_exceptions()
        if exc is None:
            # pathological collision volume: full join-encode fallback
            d = self.df.select(F.col("value").alias(col), F.col("id").alias(out))
            return df.join(d, col, "left")
        raw = F.when(
            F.col(col).isNull(), F.lit(None).cast(LongType())
        ).otherwise(term_id_col(F.col(col)))
        if not exc:
            return df.withColumn(out, raw)
        from graphula_spark.literal import literal_df

        patch = F.broadcast(
            literal_df(
                self.spark, [(i, v) for (v, i) in exc], "id long, value string"
            ).select(
                F.col("value").alias(col), F.col("id").alias(f"__exc_{out}")
            )
        )
        return (
            df.join(patch, col, "left")
            .withColumn(out, F.coalesce(F.col(f"__exc_{out}"), raw))
            .drop(f"__exc_{out}")
        )

    def lookup_terms(self, terms: list[str]) -> dict[str, int]:
        """Driver-side lookup of a handful of constants (query planning).

        This is the 'resolve constants through the dictionary' step of
        the reference stage bridge (GraphulaStageGenerator.scala:61-68);
        constants per query are few, so a collected filter join is fine.
        """
        if not terms:
            return {}
        missing = [t for t in set(terms) if t not in self._term_cache]
        if missing:
            rows = (
                self.df.where(F.col("value").isin(missing))
                .select("value", "id")
                .collect()
            )
            found = {r["value"]: r["id"] for r in rows}
            for t in missing:
                self._term_cache[t] = found.get(t)
        return {
            t: self._term_cache[t]
            for t in set(terms)
            if self._term_cache.get(t) is not None
        }

    # -- decode ----------------------------------------------------------
    def decode_col_small(self, df: DataFrame, col: str) -> DataFrame:
        """Decode an id column of a KNOWN-SMALL, KNOWN-BOUND result
        slice (caller-gated: e.g. under a small LIMIT, var never
        unbound): INNER join with the RESULT side broadcast and the
        dictionary STREAMED. The per-query full-dictionary broadcast
        build (scan + driver collect + hash relation — ~360k rows per
        decode at sf0.1, unbounded at 100 TB) drops out of the plan;
        each decode is one streaming pass over the (cached) dict with
        a tiny hash table instead (guide §3.1: broadcast the side you
        KNOW is small; a LEFT OUTER decode can never build on the
        preserved side, so the join type must change with the sides).

        Soundness: an INNER join loses exactly the rows whose id has
        no dictionary entry. Solution id vars come from the triple
        store, whose terms are all dictionary-registered at build
        (the `_:<id>` fallback in decode_col is defensive, reachable
        only through store/dictionary mismatch), and the caller gate
        excludes maybe-unbound vars — so row multiset and values are
        identical to decode_col's. NULL ids are additionally handled
        STRUCTURALLY (null-safe join key + a NULL→NULL dict row), so
        an unbound row decodes to NULL even if a caller's
        maybe-unbound bookkeeping were incomplete."""
        tmp = f"__dec_{col}"
        d = self.df.select(
            F.col("id").alias("__dec_id"), F.col("value").alias(tmp)
        ).unionByName(
            self.spark.range(0, 1, 1, 1).select(
                F.lit(None).cast("long").alias("__dec_id"),
                F.lit(None).cast("string").alias(tmp),
            )
        )
        return (
            d.join(
                F.broadcast(df),
                F.col("__dec_id").eqNullSafe(F.col(col)),
                "inner",
            )
            .drop("__dec_id", col)
            .withColumnRenamed(tmp, col)
        )

    def decode_col(self, df: DataFrame, col: str, out: str | None = None) -> DataFrame:
        """Join-decode one id column back to its term string.

        Ids missing from the dict decode as blank nodes ``_:<id>``
        (reference: Dictionary.scala:103-119). This is the *late
        materialization* boundary — call only on final results
        (reference keeps LazyBinding ids until asked,
        core/.../LazyBinding.scala:13-28).

        Past the broadcast threshold, a store-backed dictionary joins
        through its id-bucketed parquet layout: the join key includes
        the partition column (a pure function of the id), so dynamic
        partition pruning restricts the dictionary scan to the buckets
        present in the (small) result — instead of shuffling the whole
        multi-TB dictionary per query.
        """
        out = out or col
        if (
            self.bucketed_df is not None
            and self.id_buckets
            and not self._broadcastable()
        ):
            d = self.bucketed_df.select(
                F.col("id").alias(col),
                F.col("id_bucket").alias("__dec_b"),
                F.col("value").alias(f"__dec_{col}"),
            )
            keyed = df.withColumn(
                "__dec_b", F.pmod(F.col(col), F.lit(self.id_buckets))
            )
            decoded = keyed.join(d, [col, "__dec_b"], "left").drop("__dec_b")
            decoded = decoded.withColumn(
                f"__dec_{col}",
                F.coalesce(
                    F.col(f"__dec_{col}"),
                    F.concat(F.lit("_:"), F.col(col).cast("string")),
                ),
            )
            return decoded.drop(col).withColumnRenamed(f"__dec_{col}", out)
        d = self.df.select(F.col("id").alias(col), F.col("value").alias(f"__dec_{col}"))
        if self._broadcastable():
            d = F.broadcast(d)
        decoded = df.join(d, col, "left").withColumn(
            f"__dec_{col}",
            F.coalesce(
                F.col(f"__dec_{col}"),
                F.concat(F.lit("_:"), F.col(col).cast("string")),
            ),
        )
        return decoded.drop(col).withColumnRenamed(f"__dec_{col}", out)
