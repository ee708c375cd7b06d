"""Dataset/Table -> CSV, reproducing IonToCsv semantics
(/root/reference csv/IonToCsv.java:115-327):

- header from the record fields (:214-220)
- quote modes ALWAYS / REQUIRED / NON_NUMERIC with the reference's
  hand-rolled numeric test (:281-326)
- temporal formatting via the shared text-writer conversion
  (AbstractTextWriter.java:76-92): temporals -> ISO-ish strings,
  everything else str().
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv


@dataclass
class CsvWriteOptions:
    header: bool = True
    field_separator: str = ","
    text_delimiter: str = '"'
    quote_mode: str = "REQUIRED"     # ALWAYS | REQUIRED | NON_NUMERIC
    line_terminator: str = "\n"
    timezone: str = "UTC"


def _is_numeric_string(s: str) -> bool:
    """Reference's numeric test (IonToCsv.java:281-326): optional sign,
    digits, at most one dot."""
    if not s:
        return False
    body = s[1:] if s[0] in "+-" else s
    if not body:
        return False
    parts = body.split(".")
    if len(parts) > 2:
        return False
    return all(p.isdigit() for p in parts) and any(p for p in parts)


def _stringify(table: pa.Table, opts: CsvWriteOptions) -> pa.Table:
    """AbstractTextWriter.convert analog: temporals -> formatted strings."""
    cols = {}
    for name in table.column_names:
        col = table.column(name).combine_chunks()
        t = col.type
        if pa.types.is_timestamp(t):
            if t.tz:
                if opts.timezone and opts.timezone != "UTC":
                    # honor the configured output zone (the declared option
                    # was silently ignored — tz-aware values always printed
                    # in UTC): re-zone, then take the local wall clock
                    col = pc.local_timestamp(
                        col.cast(pa.timestamp(t.unit, tz=opts.timezone)))
                else:
                    col = col.cast(pa.timestamp(t.unit))  # stored UTC
            # cast -> "YYYY-MM-DD HH:MM:SS.ffffff"; use T separator (ISO).
            # (Arrow strftime lacks %f and would emit it literally.)
            cols[name] = pc.replace_substring(
                col.cast(pa.string()), pattern=" ", replacement="T",
                max_replacements=1)
        elif pa.types.is_date(t):
            cols[name] = pc.strftime(col.cast(pa.timestamp("s")), format="%Y-%m-%d")
        elif pa.types.is_time(t):
            cols[name] = col.cast(pa.string())
        else:
            cols[name] = col
    return pa.table(cols)


def table_to_csv_bytes(table: pa.Table, opts: Optional[CsvWriteOptions] = None) -> bytes:
    opts = opts or CsvWriteOptions()
    table = _stringify(table, opts)
    if opts.quote_mode == "NON_NUMERIC":
        # quote everything that does not look numeric: pyarrow has no such
        # mode, so stringify all cells and use ALWAYS on non-numeric columns
        out = io.StringIO()
        names = table.column_names
        d = opts.field_separator
        q = opts.text_delimiter
        if opts.header:
            out.write(d.join(q + n.replace(q, q * 2) + q for n in names))
            out.write(opts.line_terminator)
        pylists = [table.column(n).to_pylist() for n in names]
        for i in range(table.num_rows):
            cells = []
            for col in pylists:
                v = col[i]
                if v is None:
                    cells.append("")
                    continue
                s = str(v)
                if _is_numeric_string(s):
                    cells.append(s)
                else:
                    cells.append(q + s.replace(q, q * 2) + q)
            out.write(d.join(cells))
            out.write(opts.line_terminator)
        return out.getvalue().encode()
    if opts.text_delimiter != '"' or opts.line_terminator != "\n":
        # pyarrow's WriteOptions has no quote-char / eol parameter; a custom
        # dialect must not be silently ignored — fall back to the stdlib
        # writer (slower, but only taken when explicitly requested)
        import csv

        out = io.StringIO()
        w = csv.writer(
            out, delimiter=opts.field_separator,
            quotechar=opts.text_delimiter,
            lineterminator=opts.line_terminator,
            quoting=(csv.QUOTE_ALL if opts.quote_mode == "ALWAYS"
                     else csv.QUOTE_MINIMAL))
        names = table.column_names
        if opts.header:
            w.writerow(names)
        cols = [table.column(n).to_pylist() for n in names]
        for i in range(table.num_rows):
            w.writerow(["" if c[i] is None else str(c[i]) for c in cols])
        return out.getvalue().encode()
    sink = pa.BufferOutputStream()
    pacsv.write_csv(
        table, sink,
        write_options=pacsv.WriteOptions(
            include_header=opts.header,
            delimiter=opts.field_separator,
            quoting_style="all_valid" if opts.quote_mode == "ALWAYS" else "needed",
        ),
    )
    return sink.getvalue().to_pybytes()


def write_csv(ds, path: str, opts: Optional[CsvWriteOptions] = None) -> int:
    """Dataset -> single CSV file (driver-streamed, header once) or use
    ds.write_csv for partitioned output. Returns row count."""
    opts = opts or CsvWriteOptions()
    rows = 0
    first = True
    with open(path, "wb") as f:
        for batch in ds.iter_batches(batch_format="pyarrow"):
            t = pa.Table.from_batches([batch]) if isinstance(batch, pa.RecordBatch) else batch
            o = CsvWriteOptions(**{**opts.__dict__, "header": opts.header and first})
            f.write(table_to_csv_bytes(t, o))
            rows += t.num_rows
            first = False
    return rows
