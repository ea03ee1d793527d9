"""Delimited / JSONL corpus sources and sinks.

The reference engine only ever reads TSV/NT triple files
(reference `objects/KG.py:197-242` readers); a web-scale corpus
additionally arrives as CSV exports and JSON-lines crawl dumps, so the
engine exposes both as first-class Dataset sources with schema pinning.

Scale shape: these are thin wrappers over Ray Data's native streaming
readers/writers — each file (or block) is one read/write task, no
driver materialization, and the written directory is one file per
block, so a downstream `read_*` parallelizes across them.  Fidelity
notes live on each function: CSV is typeless on disk, so the reader
re-casts to a pinned Arrow schema; embedded quotes/commas/newlines are
handled by Arrow's RFC-4180 quoting (``newlines_in_values`` enabled on
read).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def write_csv_corpus(ds: ray.data.Dataset, out_dir: str) -> None:
    """Stream a Dataset to a directory of CSV files (one per block).
    Arrow's writer quotes embedded delimiters/quotes/newlines, so any
    utf-8 text column round-trips."""
    ds.write_csv(out_dir)


def read_csv_corpus(
    path: str, schema: pa.Schema | None = None
) -> ray.data.Dataset:
    """Read a CSV directory as a Dataset.  CSV carries no types, so
    when ``schema`` is given every column is cast back to its pinned
    Arrow type (int64 stays int64, empty strings stay strings) —
    without it, Arrow's inference decides.  ``newlines_in_values``
    lets quoted text cells span physical lines."""
    from pyarrow import csv as pacsv

    parse = pacsv.ParseOptions(newlines_in_values=True)
    kwargs = {"parse_options": parse}
    if schema is not None:
        kwargs["convert_options"] = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema},
            strings_can_be_null=False,
        )
    ds = ray.data.read_csv(path, **kwargs)
    if schema is None:
        return ds

    cols = [f.name for f in schema]

    def pin(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: t[c].cast(schema.field(c).type) for c in cols}
        )

    return ds.map_batches(pin, batch_format="pyarrow")


def write_jsonl_corpus(ds: ray.data.Dataset, out_dir: str) -> None:
    """Stream a Dataset to a directory of JSON-lines files (one per
    block) — the crawl-dump interchange format."""
    ds.write_json(out_dir)


def read_jsonl_corpus(
    path: str, schema: pa.Schema | None = None
) -> ray.data.Dataset:
    """Read a JSONL directory as a Dataset; with ``schema`` the
    columns are re-cast to pinned types (JSON numbers all arrive as
    int64/double — the cast nails narrower types and column order)."""
    ds = ray.data.read_json(path)
    if schema is None:
        return ds

    cols = [f.name for f in schema]

    def pin(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: t[c].cast(schema.field(c).type) for c in cols}
        )

    return ds.map_batches(pin, batch_format="pyarrow")
