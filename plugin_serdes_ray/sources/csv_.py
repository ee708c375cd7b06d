"""CSV -> Dataset, reproducing CsvToIon's semantics
(/root/reference csv/CsvToIon.java:78-381) Ray-Data-first: one parse task
per file via pyarrow.csv (vectorized), not a per-row Java stream.

Options mirrored (file:line in CsvToIon.java):
  header (:94), field_separator (:101), text_delimiter (:108),
  skip_empty_rows (:115), on_bad_lines ERROR/WARN/SKIP (:129, applied
  :200-210, :228-237), on_empty_header DROP/RENAME (:139, :304-351),
  skip_rows (:146), charset (:153), "\\N" -> null (:240-252),
  UTF-8 BOM strip (:290-298), trailing-unnamed-column drop (:326-339),
  duplicate-header warning (:343-349), positional colN names when
  header=False (:224-257).
"""

from __future__ import annotations

import codecs
import io
from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa
import pyarrow.csv as pacsv

from ..functions.errors import BadLineError, OnBadLines, handle_bad, logger
from ..util import package_runtime_env


@dataclass
class CsvOptions:
    header: bool = True
    field_separator: str = ","
    text_delimiter: str = '"'
    skip_empty_rows: bool = True
    on_bad_lines: str = "ERROR"          # ERROR | WARN | SKIP
    on_empty_header: str = "DROP"        # DROP | RENAME
    skip_rows: int = 0
    charset: str = "utf-8"
    null_values: list[str] = field(default_factory=lambda: ["\\N"])
    infer_types: bool = True             # False -> all columns stay strings


def _resolve_header(names: list[str], opts: CsvOptions) -> tuple[list[str], list[str]]:
    """Empty-header + trailing-unnamed + duplicate policies
    (CsvToIon.java:304-351). Returns (kept_original_names, new_names)."""
    # drop trailing unnamed columns, but keep at least one column (:326-339)
    while len(names) > 1 and names[-1].strip() == "":
        names = names[:-1]
    kept, new = [], []
    empty_i = 0
    for name in names:
        if name.strip() == "":
            if opts.on_empty_header == "DROP":
                kept.append(name)
                new.append(None)  # mark for drop
                continue
            name = f"col{empty_i}"  # RENAME (:139)
            empty_i += 1
        kept.append(name)
        new.append(name)
    seen = set()
    for n in new:
        if n is not None and n in seen:
            logger.warning("duplicate CSV header %r: last occurrence wins", n)
        seen.add(n)
    return kept, new


def parse_csv_bytes(data: bytes, opts: Optional[CsvOptions] = None) -> pa.Table:
    """Parse one CSV file's bytes -> Table (runs inside a Ray task)."""
    opts = opts or CsvOptions()
    if data.startswith(codecs.BOM_UTF8):
        data = data[len(codecs.BOM_UTF8):]  # BOM strip (:290-298)
    if opts.charset.lower().replace("_", "-") not in ("utf-8", "utf8", "ascii"):
        data = data.decode(opts.charset).encode("utf-8")

    read_opts = pacsv.ReadOptions(
        skip_rows=opts.skip_rows,
        autogenerate_column_names=not opts.header,
    )
    parse_opts = pacsv.ParseOptions(
        delimiter=opts.field_separator,
        quote_char=opts.text_delimiter or False,
        ignore_empty_lines=opts.skip_empty_rows,
        invalid_row_handler=_invalid_row_handler(opts),
    )
    convert_opts = pacsv.ConvertOptions(
        null_values=list(opts.null_values) + [""],
        strings_can_be_null=True,
        quoted_strings_can_be_null=False,
    ) if opts.infer_types else pacsv.ConvertOptions(
        null_values=list(opts.null_values),
        strings_can_be_null=True,
        quoted_strings_can_be_null=False,
        column_types={},
    )
    try:
        table = pacsv.read_csv(io.BytesIO(data), read_options=read_opts,
                               parse_options=parse_opts,
                               convert_options=convert_opts)
    except pa.ArrowInvalid as e:
        if OnBadLines(opts.on_bad_lines) is OnBadLines.ERROR:
            raise BadLineError(str(e)[:250]) from e
        handle_bad(opts.on_bad_lines, f"csv parse: {e}")
        return pa.table({})
    if not opts.infer_types:
        table = pa.table(
            {n: table.column(n).cast(pa.string()) for n in table.column_names})
    if opts.header:
        kept, new = _resolve_header(list(table.column_names), opts)
        table = table.select(list(range(len(kept))))
        keep_idx = [i for i, n in enumerate(new) if n is not None]
        table = table.select(keep_idx).rename_columns(
            [new[i] for i in keep_idx])
    else:
        # positional colN names (CsvToIon.java headerless rows -> list; our
        # columnar equivalent is col0..colN-1)
        table = table.rename_columns(
            [f"col{i}" for i in range(table.num_columns)])
    return table


def _invalid_row_handler(opts: CsvOptions):
    policy = OnBadLines(opts.on_bad_lines)

    def handler(row) -> str:
        # field-count mismatch policy (CsvToIon.java:228-237)
        if policy is OnBadLines.ERROR:
            return "error"
        if policy is OnBadLines.WARN:
            logger.warning("skipping bad csv row: %s", str(row)[:250])
        return "skip"

    return handler


def read_csv(paths: list[str] | str, opts: Optional[CsvOptions] = None,
             concurrency: Optional[int] = None):
    """Distributed CSV read: one parse task per file (files are the
    partition unit, matching the engine's resume granularity)."""
    import ray.data

    opts = opts or CsvOptions()
    if isinstance(paths, str):
        paths = [paths]

    def parse(batch: pa.Table):
        for item in batch.to_pylist():
            with open(item["path"], "rb") as f:
                data = f.read()
            t = parse_csv_bytes(data, opts)
            if t.num_rows or t.num_columns:
                yield t

    ds = ray.data.from_items([{"path": str(p)} for p in paths])
    return ds.map_batches(parse, batch_size=1, batch_format="pyarrow",
                          concurrency=min(concurrency or 8, len(paths)),
                          num_cpus=1, runtime_env=package_runtime_env())


def read_csv_table(path: str, opts: Optional[CsvOptions] = None) -> pa.Table:
    """Driver-side single-file parse (tests / small files)."""
    with open(path, "rb") as f:
        return parse_csv_bytes(f.read(), opts)
