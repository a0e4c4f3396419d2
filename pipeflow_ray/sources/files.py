"""File sources: CSV / JSON / Parquet.

CSV mirrors the reference's reader semantics (``PipeFlow/CsvReader.cs:68-234``)
on top of Arrow's CSV parser: custom delimiter, header or synthesized
``Column{i}`` names, whitespace trim, and value auto-conversion
(null/int/double/bool/timestamp inference — Arrow's converter covers the same
set as ``CsvReader.ConvertValue``, ``CsvReader.cs:208-234``). Parquet is the
primary engine format (north rule); CSV/JSON are ingest compatibility.
"""

from __future__ import annotations

from pyarrow import csv as pacsv

import ray.data


def read_csv(
    paths,
    delimiter: str = ",",
    has_header: bool = True,
    trim_whitespace: bool = True,
    column_names: list[str] | None = None,
    **kw,
) -> ray.data.Dataset:
    """CSV source with reference-compatible parsing options.

    - ``has_header=False`` → synthesized ``Column0..N`` names
      (``CsvReader.cs:85-96``);
    - quoted fields with embedded delimiters/newlines handled by Arrow's
      parser (the reference hand-rolls this, ``CsvReader.cs:120-206``);
    - type auto-conversion by Arrow type inference.
    """
    parse = pacsv.ParseOptions(delimiter=delimiter)
    convert = pacsv.ConvertOptions()
    read_opts: dict = {}
    if not has_header:
        import pyarrow.parquet  # noqa: F401  (ensure pa loaded)

        # peek one line to count columns, then synthesize names
        first = open(paths if isinstance(paths, str) else paths[0], "rb").readline()
        n_cols = len(first.decode("utf-8", "ignore").rstrip("\n").split(delimiter))
        names = column_names or [f"Column{i}" for i in range(n_cols)]
        read_opts["read_options"] = pacsv.ReadOptions(column_names=names)
    ds = ray.data.read_csv(paths, parse_options=parse, convert_options=convert, **read_opts, **kw)
    if trim_whitespace:
        import pyarrow as pa
        import pyarrow.compute as pc

        def _trim(t: pa.Table) -> pa.Table:
            for i, name in enumerate(t.column_names):
                col = t.column(i)
                if pa.types.is_string(col.type):
                    t = t.set_column(i, name, pc.utf8_trim_whitespace(col))
            return t

        ds = ds.map_batches(_trim, batch_format="pyarrow")
    return ds


def read_json(paths, **kw) -> ray.data.Dataset:
    """JSON-lines / array-of-objects source (``PipeFlow/Json/JsonReader.cs``);
    nested objects/arrays become Arrow struct/list columns."""
    return ray.data.read_json(paths, **kw)


def read_parquet(paths, columns: list[str] | None = None, **kw) -> ray.data.Dataset:
    return ray.data.read_parquet(paths, columns=columns, **kw)


def select_path(ds: ray.data.Dataset, path: str) -> ray.data.Dataset:
    """JSONPath-ish root selection (``JsonReader.SelectPath``,
    ``PipeFlow/Json/JsonReader.cs:73-164``): '$.a.b' extracts nested struct
    fields as the new top-level columns — a vectorized struct-field walk."""
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = [p for p in path.lstrip("$.").split(".") if p]

    def _extract(t: pa.Table) -> pa.Table:
        col = t[parts[0]]
        for p in parts[1:]:
            col = pc.struct_field(col, p)
        if pa.types.is_struct(col.type):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pa.Table.from_struct_array(col)
        return pa.table({parts[-1]: col})

    return ds.map_batches(_extract, batch_format="pyarrow")
