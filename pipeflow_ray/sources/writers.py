"""Formatted CSV / JSON sinks (reference surfaces: ``CsvWriter.cs:26-147``
— delimiter / headers / quote-all / append / value formatting — and
``Json/JsonWriter.cs:21-106`` — indentation, camelCase naming, append-merge).

Two shapes per format:
- a DISTRIBUTED directory sink (`write_csv` / `write_json`) — Ray writes one
  file per block; formatting runs vectorized inside ``map_batches``;
- a SINGLE-FILE driver sink (`to_csv_file` / `to_json_file`) matching the
  reference's one-file semantics (incl. append) — for small results only;
  the directory sink is the 100-TB path.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


@dataclass
class CsvWriteOptions:
    """``CsvWriter.With*`` fluent options (``CsvWriter.cs:26-54``)."""

    delimiter: str = ","
    include_headers: bool = True
    quote_all: bool = False
    append: bool = False
    date_format: str = "%Y-%m-%d %H:%M:%S"  # invariant round-trip analog
    bool_true: str = "True"   # .NET bool.ToString()
    bool_false: str = "False"


@dataclass
class JsonWriteOptions:
    """``JsonWriter`` defaults: indented + camelCase (``JsonWriter.cs:21-27``)."""

    indented: bool = True
    camel_case: bool = True
    append: bool = False


def _format_batch(t: pa.Table, opts: CsvWriteOptions) -> pa.Table:
    """Vectorized value formatting: timestamps → date_format strings, bools →
    the configured literals (``CsvWriter.ConvertToString``)."""
    cols = {}
    for name in t.column_names:
        c = t[name]
        if pa.types.is_timestamp(c.type) or pa.types.is_date(c.type):
            cols[name] = pc.strftime(c, format=opts.date_format)
        elif pa.types.is_boolean(c.type):
            cols[name] = pc.if_else(c, opts.bool_true, opts.bool_false)
        else:
            cols[name] = c
    return pa.table(cols)


def _guard_append_dir(path: str, append: bool) -> None:
    """Ray file sinks APPEND part files into existing directories; guard the
    default (append=False) so a re-run cannot silently double rows."""
    if not append and os.path.isdir(path) and any(
        not n.startswith(".") for n in os.listdir(path)
    ):
        raise FileExistsError(
            f"{path} already contains output; pass append=True to add files "
            "or remove the directory for a clean write"
        )


def write_csv(ds: ray.data.Dataset, path: str, options: CsvWriteOptions | None = None) -> None:
    """Distributed formatted CSV sink (directory of part files)."""
    opts = options or CsvWriteOptions()
    _guard_append_dir(path, opts.append)
    formatted = ds.map_batches(lambda t: _format_batch(t, opts), batch_format="pyarrow")
    header, delim, quote = opts.include_headers, opts.delimiter, opts.quote_all

    def _args():  # WriteOptions is not picklable — construct on the worker
        from pyarrow import csv as pacsv

        return {
            "write_options": pacsv.WriteOptions(
                include_header=header,
                delimiter=delim,
                quoting_style="all_valid" if quote else "needed",
            )
        }

    formatted.write_csv(path, arrow_csv_args_fn=_args)


def to_csv_file(ds: "ray.data.Dataset | pa.Table", file_path: str,
                options: CsvWriteOptions | None = None) -> int:
    """Single-file CSV with the reference's append contract
    (``CsvWriter.cs:56-89``: append skips the header). Driver-side — small
    results only. Returns rows written."""
    from pyarrow import csv as pacsv

    opts = options or CsvWriteOptions()
    t = ds if isinstance(ds, pa.Table) else pa.concat_tables(
        [pa.Table.from_batches([b]) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    t = _format_batch(t, opts)
    exists = os.path.exists(file_path) and os.path.getsize(file_path) > 0
    write_header = opts.include_headers and not (opts.append and exists)
    buf = pa.BufferOutputStream()
    pacsv.write_csv(
        t, buf,
        write_options=pacsv.WriteOptions(
            include_header=write_header,
            delimiter=opts.delimiter,
            quoting_style="all_valid" if opts.quote_all else "needed",
        ),
    )
    data = buf.getvalue().to_pybytes()
    mode = "ab" if (opts.append and exists) else "wb"
    os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
    with open(file_path, mode) as f:
        f.write(data)
    return t.num_rows


def camel_case(name: str) -> str:
    """.NET JsonNamingPolicy.CamelCase analog for snake_case / PascalCase
    column names: ``first_name``/``FirstName`` → ``firstName``."""
    if "_" in name:
        parts = [p for p in name.split("_") if p]
        if not parts:
            return name
        return parts[0].lower() + "".join(p[:1].upper() + p[1:] for p in parts[1:])
    return name[:1].lower() + name[1:]


def write_json(ds: ray.data.Dataset, path: str, options: JsonWriteOptions | None = None) -> None:
    """Distributed JSONL sink with optional camelCase field naming — the
    scale form (one file per block; indentation does not apply to JSONL)."""
    opts = options or JsonWriteOptions()
    _guard_append_dir(path, opts.append)
    if opts.camel_case:
        def _rename(t: pa.Table) -> pa.Table:
            return t.rename_columns([camel_case(c) for c in t.column_names])

        ds = ds.map_batches(_rename, batch_format="pyarrow")
    ds.write_json(path)


def to_json_file(ds: "ray.data.Dataset | pa.Table", file_path: str,
                 options: JsonWriteOptions | None = None) -> int:
    """Single-file JSON ARRAY with the reference's append-merge contract
    (``JsonWriter.cs:56-76``: append deserializes the existing array and
    re-serializes the union). Driver-side — small results only."""
    opts = options or JsonWriteOptions()
    t = ds if isinstance(ds, pa.Table) else pa.concat_tables(
        [pa.Table.from_batches([b]) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    if opts.camel_case:
        t = t.rename_columns([camel_case(c) for c in t.column_names])
    rows = t.to_pylist()
    if opts.append and os.path.exists(file_path) and os.path.getsize(file_path) > 0:
        with open(file_path) as f:
            existing = json.load(f)
        rows = list(existing) + rows
    os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
    tmp = file_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rows, f, indent=2 if opts.indented else None, default=str)
    os.replace(tmp, file_path)
    return len(rows)
