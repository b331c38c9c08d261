"""Source readers, Ray-Data-first with pruning pushed to the read.

The reference consumes file/CSV and JSONL inputs supplied by Embulk's input
plugins (example/example.yml:1-11, example/nested.yml:1-6); here the same
shapes come from Ray Data's native readers, with:

* column pruning at the parquet read (``columns=[...]`` — only needed
  columns leave storage)
* declared Arrow schemas for CSV (the reference's fixed-schema model:
  TimestampFormatFilterPlugin.java:82-90 — schemas are declared, not
  inferred)
* JSONL → Arrow structs (the ``json`` column type analog)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv


def read_parquet(paths, columns=None, parallelism=None, row_filter=None,
                 **kwargs):
    """Column-pruned parquet read (the only sanctioned way to read the lake
    and testdata tables — never read all columns for a 2-column transform).

    ``row_filter`` takes a pyarrow dataset expression
    (e.g. ``pc.field("lang") == "en"``) pushed down to row-group pruning."""
    import ray.data

    if parallelism is not None:
        kwargs["override_num_blocks"] = parallelism
    if row_filter is not None:
        kwargs["filter"] = row_filter
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def read_csv_with_schema(paths, schema: "dict[str, pa.DataType] | pa.Schema",
                         delimiter: str = ",", **kwargs):
    """CSV with a DECLARED schema (no inference), Embulk-style.

    ``schema`` maps column name → Arrow type in declared order; string-typed
    timestamp columns can then flow through TimestampFormatStage exactly like
    the reference's filter examples."""
    import ray.data

    if isinstance(schema, pa.Schema):
        fields = list(schema)
    else:
        fields = [pa.field(k, v) for k, v in schema.items()]
    names = [f.name for f in fields]
    convert = pacsv.ConvertOptions(
        column_types={f.name: f.type for f in fields})
    read = pacsv.ReadOptions(column_names=names)
    parse = pacsv.ParseOptions(delimiter=delimiter)
    return ray.data.read_csv(paths, convert_options=convert,
                             read_options=read, parse_options=parse, **kwargs)


def read_jsonl(paths, **kwargs):
    """JSON-lines → Dataset of Arrow structs (nested columns addressable by
    the JSONPath configs of TimestampFormatStage)."""
    import ray.data

    return ray.data.read_json(paths, **kwargs)
