"""Local materialized-table sink: versioned parquet snapshots with MERGE
semantics (SURVEY.md §4 custom piece #1, local emulation).

Layout per table::

    <root>/<TABLE>/v=<n>/part-*.parquet   # snapshot versions
    <root>/<TABLE>/_CURRENT               # text file: current version n

A merge writes version n+1 from (current ∪ changes) → latest-by-key, then
atomically flips the pointer — readers never see a partial snapshot
(the rename-free pointer flip is the same trick Delta's _last_checkpoint
uses). WRITERS are serialized by optimistic concurrency (round 4): every
write stages into a unique dir, atomically claims its version number by
rename, and CAS-checks ``_CURRENT`` against the version it derived from
before flipping — a losing concurrent merge raises
``ConcurrentWriteError`` and rolls back instead of silently discarding
the winner's changes (see ``overwrite``). In production this class is swapped for the Snowflake adapter
(sinks/snowflake.py) or a real lakehouse table; the pipeline code is
sink-agnostic.

Schema evolution (E2): ``merge`` aligns old and new schemas with
``unionByName(allowMissingColumns=True)`` — a column appearing
mid-stream widens the snapshot, with NULLs for history until backfill.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.upsert import latest_by_key

# Internal column marking hard-deleted keys. Tombstones are RETAINED in the
# stored snapshot and filtered at read time: if deletes were physically
# dropped, a delete arriving in an *earlier* micro-batch than a stale
# insert/update for the same key (out-of-order replay, backfill overlap)
# would lose its memory and the stale row would resurrect. Keeping the
# (key, seq, deleted) row makes the merge commutative across batches —
# correctness can't depend on delivery order at 100 TB.
TOMBSTONE = "_tombstone"


class ConcurrentWriteError(RuntimeError):
    """Another writer advanced the table between this writer's snapshot
    read and its pointer flip. The losing write is rolled back and MUST
    be retried from the new current version — silently flipping would
    discard the other writer's merge (lost update)."""


class ParquetSnapshotSink:
    def __init__(self, root: str) -> None:
        self.root = root

    # ---- version bookkeeping -------------------------------------------

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def current_version(self, table: str) -> int:
        ptr = os.path.join(self._table_dir(table), "_CURRENT")
        if not os.path.exists(ptr):
            return -1
        with open(ptr) as fh:
            return int(fh.read().strip())

    def _flip(self, table: str, version: int) -> None:
        d = self._table_dir(table)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "_CURRENT.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(d, "_CURRENT"))  # atomic pointer flip

    # ---- read / write ---------------------------------------------------

    def exists(self, table: str) -> bool:
        return self.current_version(table) >= 0

    def tables(self) -> list[str]:
        """Every table directory with a committed version."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            name
            for name in os.listdir(self.root)
            if not name.startswith("_")
            and os.path.exists(os.path.join(self.root, name, "_CURRENT"))
        )

    # ---- cross-table generations (VERDICT r08 #3) -------------------------
    #
    # Per-table ``_CURRENT`` flips are atomic per TABLE, so a reader that
    # walks the store between two tables' merges sees a torn multi-table
    # state even when the writer applied a perfectly consistent cut
    # (operators/snapshot.py). A GENERATION is one manifest committing N
    # table versions atomically: writers merge all tables, then flip ONE
    # ``_GENERATION`` pointer; generation readers see all-old or all-new,
    # never mixed — the multi-table analogue of the _CURRENT trick, and
    # the filesystem-local shape of a lakehouse catalog commit.

    def _gen_dir(self) -> str:
        return os.path.join(self.root, "_generations")

    def current_generation(self) -> int:
        ptr = os.path.join(self.root, "_GENERATION")
        if not os.path.exists(ptr):
            return -1
        with open(ptr) as fh:
            return int(fh.read().strip())

    def manifest(self, gen: int | None = None) -> dict[str, int]:
        """table -> version mapping committed by generation ``gen``
        (default: the current generation)."""
        import json

        if gen is None:
            gen = self.current_generation()
        if gen < 0:
            raise FileNotFoundError(f"no generation committed under {self.root}")
        path = os.path.join(self._gen_dir(), f"gen={gen}.json")
        with open(path) as fh:
            return {t: int(v) for t, v in json.load(fh).items()}

    def publish_generation(
        self,
        versions: dict[str, int] | None = None,
        expected_generation: int | None = None,
    ) -> int:
        """Atomically commit one cross-table generation.

        ``versions``: explicit table -> version map; default = the
        current version of every table in the store. Same optimistic-
        concurrency discipline as ``overwrite``: the manifest file is
        claimed by exclusive create (two publishers racing to the same
        generation number produce exactly one winner), and the pointer
        flip CAS-checks ``expected_generation`` (default: the
        generation as of now) so a losing publisher fails loudly.

        Crash recovery: a publisher dying between the claim and the
        pointer flip leaves an ORPHANED manifest (gen=N.json exists,
        pointer at N-1). An orphan is distinguishable from a live
        racer's claim by the pointer: a committed generation's file is
        never at pointer+1. On a claim conflict with the pointer still
        behind, the orphan is replaced and the claim retried ONCE — in
        the (already-lost-update-prone) window where a LIVE racer holds
        the claim, the replacement resolves the race as one publisher's
        lost update, the same outcome class as ConcurrentWriteError,
        never a torn manifest (both candidate manifests are internally
        consistent snapshots of per-table pointers)."""
        import json

        if versions is None:
            versions = {t: self.current_version(t) for t in self.tables()}
        if expected_generation is None:
            expected_generation = self.current_generation()
        g = expected_generation + 1
        os.makedirs(self._gen_dir(), exist_ok=True)
        path = os.path.join(self._gen_dir(), f"gen={g}.json")
        for attempt in (0, 1):
            try:
                with open(path, "x") as fh:  # exclusive create = atomic claim
                    json.dump(versions, fh, sort_keys=True)
                break
            except FileExistsError as e:
                if attempt == 0 and self.current_generation() < g:
                    # orphaned claim from a dead mid-publish writer (a
                    # COMMITTED gen=N file always has pointer >= N):
                    # replace it and retry the claim once
                    os.remove(path)
                    continue
                raise ConcurrentWriteError(
                    f"generation {g} already claimed by another publisher; "
                    "re-read the store and retry"
                ) from e
        if self.current_generation() != expected_generation:
            os.remove(path)
            raise ConcurrentWriteError(
                f"store advanced past generation {expected_generation} "
                "while this publish was derived from it; retry"
            )
        tmp = os.path.join(self.root, "_GENERATION.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(g))
        os.replace(tmp, os.path.join(self.root, "_GENERATION"))
        return g

    def read_generation(
        self, spark: SparkSession, table: str, gen: int | None = None
    ) -> DataFrame:
        """Read ``table`` at the version the generation manifest pins —
        immune to concurrent per-table flips (tombstones filtered)."""
        return self.read_version(spark, table, self.manifest(gen)[table])

    def read_all_at_generation(
        self, spark: SparkSession, gen: int | None = None
    ) -> dict[str, DataFrame]:
        """Every table of one generation — a transactionally consistent
        view of the whole store (all-old or all-new, never mixed)."""
        m = self.manifest(gen)
        return {t: self.read_version(spark, t, v) for t, v in m.items()}

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        """User-facing snapshot: tombstones filtered out (hard-deleted keys
        are invisible but retained internally — see ``merge``)."""
        df = self._read_raw(spark, table)
        if TOMBSTONE in df.columns:
            df = df.filter(~F.col(TOMBSTONE)).drop(TOMBSTONE)
        return df

    def _read_raw(self, spark: SparkSession, table: str) -> DataFrame:
        v = self.current_version(table)
        if v < 0:
            raise FileNotFoundError(f"no snapshot for table {table!r} under {self.root}")
        return spark.read.parquet(os.path.join(self._table_dir(table), f"v={v}"))

    def read_version(self, spark: SparkSession, table: str, version: int) -> DataFrame:
        """Time travel: read a specific retained snapshot version."""
        path = os.path.join(self._table_dir(table), f"v={version}")
        if not os.path.isdir(path):
            raise FileNotFoundError(f"version {version} of {table!r} not found")
        df = spark.read.parquet(path)
        if TOMBSTONE in df.columns:
            df = df.filter(~F.col(TOMBSTONE)).drop(TOMBSTONE)
        return df

    def versions(self, table: str) -> list[int]:
        d = self._table_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(name[2:]) for name in os.listdir(d) if name.startswith("v=")
        )

    def vacuum(self, table: str, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshot versions (never
        the current pointer's target). Old versions are what give replay /
        time travel; at scale they're also storage — same trade Delta's
        VACUUM makes."""
        import shutil

        current = self.current_version(table)
        pinned = {current}
        # never drop the version the committed generation manifest pins —
        # a generation reader must stay consistent across maintenance
        g = self.current_generation()
        if g >= 0:
            pinned.add(self.manifest(g).get(table))
        removable = [
            v for v in self.versions(table)[:-keep_last] if v not in pinned
        ]
        for v in removable:
            shutil.rmtree(os.path.join(self._table_dir(table), f"v={v}"))
        return removable

    def compact(
        self,
        spark: SparkSession,
        table: str,
        target_files: int = 8,
        zorder_by: list[str] | None = None,
    ) -> int:
        """Rewrite the current snapshot into ``target_files`` files — the
        small-file compaction every micro-batch MERGE sink needs (each
        merge writes shuffle.partitions files; hundreds of batches →
        thousands of small files → scan death at scale).

        ``zorder_by``: also recluster along the Morton curve of these
        columns (operators/zorder.py) so footer min/max stats prune scans
        on every listed column — the OPTIMIZE ... ZORDER BY posture.
        Merges append in arrival order, so clustering decays with every
        batch; compaction is exactly the place to restore it."""
        base_v = self.current_version(table)
        df = self._read_raw(spark, table)
        if zorder_by:
            from snowflake_cdc_spark.operators.zorder import with_z_value

            df = (
                with_z_value(df, zorder_by)
                .repartitionByRange(target_files, F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            df = df.coalesce(target_files)
        return self.overwrite(df, table, expected_current=base_v)

    def overwrite(
        self, df: DataFrame, table: str, expected_current: int | None = None
    ) -> int:
        """Write the next snapshot version and flip the pointer, with
        optimistic-concurrency discipline (the Delta/Iceberg commit
        posture, filesystem-local):

        1. the plan executes into a uniquely-named staging dir — a slow
           competing write can never mix files into a live version;
        2. ``os.rename(stage, v=<n>)`` atomically CLAIMS the version
           number — two writers racing to the same ``n`` produce exactly
           one winner (rename onto a non-empty directory fails);
        3. before the flip, ``_CURRENT`` is re-read and compared to
           ``expected_current`` (the version this write was derived
           from — CAS): if another writer advanced the table meanwhile,
           the claimed version is rolled back and
           ``ConcurrentWriteError`` raised, so the LOSER fails loudly
           instead of silently discarding the winner's changes.

        ``expected_current=None`` resolves to the pointer as of now —
        callers that derived ``df`` from an earlier read (``merge``,
        ``compact``) pass the version they actually read. The re-read
        is a guard, not a lock: writers that lose the rename race or
        the pointer check must retry from the new current version."""
        import shutil
        import uuid

        if expected_current is None:
            expected_current = self.current_version(table)
        v = expected_current + 1
        d = self._table_dir(table)
        os.makedirs(d, exist_ok=True)
        stage = os.path.join(d, f".v{v}.stage.{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(stage)
        final = os.path.join(d, f"v={v}")
        try:
            os.rename(stage, final)
        except OSError as e:
            # only a lost claim race (target already exists) is a
            # concurrency conflict worth retrying; EACCES/ENOSPC/EXDEV
            # etc. are genuine I/O failures — re-raise them unchanged so
            # callers don't retry an operation that can never succeed
            import errno

            if e.errno not in (errno.ENOTEMPTY, errno.EEXIST, errno.EISDIR):
                shutil.rmtree(stage, ignore_errors=True)
                raise
            shutil.rmtree(stage, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{table}: version v={v} already claimed by another "
                f"writer; re-read the snapshot and retry the merge"
            ) from e
        if self.current_version(table) != expected_current:
            shutil.rmtree(final, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{table}: snapshot advanced past v={expected_current} "
                f"while this write was derived from it; retry from the "
                f"new current version"
            )
        self._flip(table, v)
        return v

    def merge(
        self,
        changes: DataFrame,
        table: str,
        key_cols: list[str],
        seq_col: str = "seq",
        delete_col: str = "is_delete",
        hard_delete: bool = True,
        logical_col: str = "is_deleted",
        prefer_incoming_on_tie: bool = False,
    ) -> int:
        """MERGE one micro-batch of changes into the snapshot.

        next = latest_by_key(current_raw ∪ changes). Hard deletes become
        retained tombstone rows (filtered by ``read``); logical deletes
        materialize as ``logical_col``. Because the stored seq (including
        tombstones') participates in the latest-by-key race, the merge is
        idempotent AND commutative across batches: replaying an old batch
        or receiving events out of order cannot regress a row — effective
        exactly-once on top of at-least-once delivery (SURVEY.md §2.8).
        """
        spark = changes.sparkSession
        delete_marker = F.coalesce(F.col(delete_col), F.lit(False))

        if hard_delete:
            staged = changes.withColumn(TOMBSTONE, delete_marker)
        else:
            staged = changes.withColumn(logical_col, delete_marker)
        # Seq-tie semantics: by DEFAULT the stored row wins ties, so an
        # at-least-once redelivery of an already-applied event (possibly
        # missing columns added since) can never regress the snapshot —
        # that's the idempotency contract. A drift backfill (E3) replays
        # the same seqs deliberately carrying MORE data and opts into
        # ``prefer_incoming_on_tie`` (see latest_by_key compound order).
        incoming_rank = 2 if prefer_incoming_on_tie else 0  # stored rank is 1
        staged = staged.drop(delete_col).withColumn("__src", F.lit(incoming_rank))

        # pin the version this merge derives from: the CAS in overwrite
        # compares against it, so a concurrent merge that advances the
        # table between here and the flip fails THIS writer loudly
        base_v = self.current_version(table)
        if base_v >= 0:
            current = spark.read.parquet(
                os.path.join(self._table_dir(table), f"v={base_v}")
            ).withColumn("__src", F.lit(1))
            # E2 widen: schema drift handled by name-based union
            combined = current.unionByName(staged, allowMissingColumns=True)
        else:
            combined = staged

        latest = latest_by_key(combined, key_cols, [seq_col, "__src"]).drop("__src")
        if hard_delete:
            latest = latest.withColumn(
                TOMBSTONE, F.coalesce(F.col(TOMBSTONE), F.lit(False))
            )
        else:
            latest = latest.withColumn(
                logical_col, F.coalesce(F.col(logical_col), F.lit(False))
            )
        return self.overwrite(latest, table, expected_current=base_v)
