"""Bulk pipeline controller — the reference's two public entry points,
Spark-native (SURVEY.md §3).

``add_new_tables`` (add_output.py:458-561): discover tables by querying
the stream itself (value distribution of the shard-merged table identity,
take=100000 — add_output.py:524-534), skip excluded / already-handled
ones, build one PipelineSpec per new table (upsert keys from the catalog
when present, else the synthetic key), and materialize them through ONE
shared pipeline. Unlike the reference (control-plane loop creating N
server-side outputs), the data plane here is a single foreachBatch over
one source scan regardless of table count.

``update_existing_tables`` (add_output.py:564-668): for every table that
already has a snapshot, run the E1→E3 drift loop (detect new catalog
columns, widen, backfill from first-seen − pad).

The reference's discovery gap — tables with zero events are never found
(TODO at add_output.py:534) — is inherited deliberately: discovery is
*from data*; declare zero-event tables explicitly via ``include``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_cdc_spark.catalog import Catalog
from snowflake_cdc_spark.functions.strings import actual_full_table_name
from snowflake_cdc_spark.operators.stats import value_distribution
from snowflake_cdc_spark.plans.spec import DeleteStrategy, PipelineSpec
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.streaming.evolution import reconcile
from snowflake_cdc_spark.streaming.pipeline import CdcPipeline

DISCOVERY_TAKE = 100_000  # add_output.py:525


@dataclass
class PipelineController:
    spark: SparkSession
    sink: ParquetSnapshotSink
    catalog: Catalog = field(default_factory=Catalog)
    delete_strategy: DeleteStrategy = DeleteStrategy.HARD
    output_interval_minutes: int = 1
    use_synthetic_key_fallback: bool = True

    # ---- discovery (A1 over the stream itself) -------------------------

    def discover_tables(self, events: DataFrame) -> list[str]:
        ident = actual_full_table_name(
            F.col("data.database_name"), F.col("data.table_name")
        ).alias("actual_full_table_name")
        dist = value_distribution(
            events.select(ident), "actual_full_table_name", take=DISCOVERY_TAKE
        )
        return [r["actual_full_table_name"] for r in dist.collect()]

    def _spec_for(self, full_table_name: str) -> PipelineSpec:
        key_columns: list[str] = []
        synthetic = True
        if full_table_name in self.catalog:
            pks = self.catalog.get(full_table_name).primary_key_columns
            if pks:
                key_columns, synthetic = pks, False
        elif not self.use_synthetic_key_fallback:
            raise KeyError(f"{full_table_name} not in catalog and synthetic keys disabled")
        return PipelineSpec(
            full_table_name=full_table_name,
            key_columns=key_columns,
            use_synthetic_key=synthetic,
            delete_strategy=self.delete_strategy,
            output_interval_minutes=self.output_interval_minutes,
        )

    # ---- entry point 1: bulk create ------------------------------------

    def add_new_tables(
        self,
        raw_path: str,
        include: set[str] | None = None,
        exclude: set[str] | None = None,
        run: bool = True,
    ) -> list[PipelineSpec]:
        """Create pipelines for every discovered table not excluded and
        not already materialized; optionally run the batch materialization
        (run_output analog). Returns the new specs."""
        events = self.spark.read.option("mergeSchema", "true").parquet(raw_path)
        # identifiers compare case-insensitively everywhere (catalog.py);
        # dedup discovered ∪ include by lowercase, keeping the first
        # spelling seen (data's spelling wins over the include list's)
        by_ci: dict[str, str] = {}
        for t in [*self.discover_tables(events), *sorted(include or ())]:
            by_ci.setdefault(t.lower(), t)
        exclude_ci = {t.lower() for t in (exclude or ())}
        new = sorted(
            t
            for ci, t in by_ci.items()
            if ci not in exclude_ci
            and not self.sink.exists(  # "already handled" (add_output.py:512-516)
                PipelineSpec(full_table_name=t).target_table
            )
        )
        specs = [self._spec_for(t) for t in new]
        # target names keep only the table segment (upper-cased, matching
        # the reference's warehouse naming, add_output.py:437) — two
        # schemas sharing a table name would silently interleave into one
        # snapshot; fail loudly instead
        by_target: dict[str, str] = {}
        for s in specs:
            if s.target_table in by_target:
                raise ValueError(
                    f"target table collision: {by_target[s.target_table]!r} and "
                    f"{s.full_table_name!r} both materialize to {s.target_table!r}; "
                    "exclude one or map it to a distinct target"
                )
            by_target[s.target_table] = s.full_table_name
        if run and specs:
            CdcPipeline(self.spark, specs, self.sink).materialize_batch(events)
        return specs

    # ---- entry point 3: drift reconciliation ---------------------------

    def update_existing_tables(
        self,
        raw_path: str,
        include: set[str] | None = None,
        exclude: set[str] | None = None,
        event_time_col: str | None = None,
    ) -> dict[str, list[str]]:
        """Run E1→E3 for every cataloged table that already has a
        snapshot. ``event_time_col`` (e.g. an ingest timestamp on the
        envelope) enables the bounded first-seen−pad backfill; without it
        drift triggers a full InputStart replay. Returns
        {full_table_name: [new columns added]} for tables that changed."""
        include_ci = {t.lower() for t in (include or ())}
        exclude_ci = {t.lower() for t in (exclude or ())}
        out: dict[str, list[str]] = {}
        for table in self.catalog.tables():  # original-case names
            if exclude_ci and table.lower() in exclude_ci:
                continue
            if include_ci and table.lower() not in include_ci:
                continue
            spec = self._spec_for(table)
            if not self.sink.exists(spec.target_table):
                continue
            pipe = CdcPipeline(self.spark, [spec], self.sink)
            added = reconcile(
                self.spark,
                pipe,
                self.sink,
                self.catalog.get(table),
                spec.target_table,
                raw_path,
                ts_col=event_time_col,
            )
            if added:
                out[table] = added
        return out
