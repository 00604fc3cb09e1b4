"""PipelineSpec — the declarative IR of one per-table CDC pipeline.

The reference declares a pipeline as a sequence of JSON template
mutations (OutputTemplateRequest → EqualToFilterV2 → AddRawField* →
ToggleUpsertKey → SetIsDelete → deploy; add_output.py:89-152, 409-453).
Here the entire declaration is one dataclass; "deploy" is
``CdcPipeline.run_batch()`` / ``.start_stream()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from enum import Enum


class DeleteStrategy(Enum):
    """add_output.py:138-150 / README.md:61."""

    HARD = "hard"  # SetIsDelete → rows physically removed
    LOGICAL = "logical"  # is_delete mapped to a boolean column


class StartPosition(Enum):
    """startExecutionFrom (add_output.py:442, 260)."""

    INPUT_START = "input_start"  # replay everything
    AT_TIME = "at_time"  # bounded backfill from a timestamp


@dataclass
class PipelineSpec:
    """One source-table → target-table materialization."""

    full_table_name: str  # demux filter value (README.md:26)
    key_columns: list[str] = field(default_factory=list)  # K1 upsert keys
    use_synthetic_key: bool = False  # K2: engine-computed data.primary_key
    delete_strategy: DeleteStrategy = DeleteStrategy.HARD
    logical_delete_col: str = "is_deleted"
    # column projection: None → auto-discover from data.row schema (the
    # reference's dynamic-schema posture, README.md:34); else an explicit
    # list of (source_field, output_name) pairs
    columns: list[tuple[str, str]] | None = None
    output_interval_minutes: int = 1  # S6 micro-batch trigger (README.md:60)
    start_position: StartPosition = StartPosition.INPUT_START
    start_time: datetime | None = None  # for AT_TIME
    # envelope column carrying event/ingest time; required for AT_TIME
    # (the filter is applied per spec inside the demux transform, so each
    # table in a shared pipeline gets its own replay horizon)
    event_time_column: str | None = None
    seq_column: str = "seq"
    merge_shards: bool = True  # strip _part_N and merge (README.md:29-31)
    # E4: a configured constant column appended to every row AND to the
    # upsert key (EXTRA_PK_COLUMN, add_output.py:9-18, applied 553-555) —
    # e.g. a tenant/keyspace discriminator when several sources share one
    # target table
    extra_key_column: tuple[str, str] | None = None  # (name, constant value)

    @property
    def target_table(self) -> str:
        """Warehouse identity is upper-cased (add_output.py:437)."""
        return self.full_table_name.split(".")[-1].upper()
