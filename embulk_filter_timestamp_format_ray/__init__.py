"""Ray-Data-native CDC/ingest engine with the per-column timestamp
re-parsing/re-formatting competency of embulk-filter-timestamp_format.

Built from scratch on ``ray.data.Dataset`` + zero-copy Arrow
``map_batches``; see SURVEY.md for the blueprint and the mapping from
the reference (/root/reference, file:line cites in docstrings).

Layout:
    functions/   pure timestamp kernels (units, parse, format, convert)
    stages/      map_batches stages (timestamp_format, partition, dedup,
                 text stats, ANN, multimodal stubs)
    sources/     deterministic CDC/transcript generators, parquet IO
    pipelines/   CDC upsert pipeline, verification
    state/       exactly-once manifest / checkpoint handling
"""

from embulk_filter_timestamp_format_ray.config import (  # noqa: F401
    ColumnConfig,
    TaskConfig,
)

__version__ = "0.1.0"


def __getattr__(name):
    if name == "TimestampFormatStage":
        from embulk_filter_timestamp_format_ray.stages.timestamp_format import (
            TimestampFormatStage,
        )

        return TimestampFormatStage
    raise AttributeError(name)
