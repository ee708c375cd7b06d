"""The reference's end-to-end sanity flow reimplemented
(/root/reference src/test/resources/sanity-checks/
schema_inference_roundtrip.yaml:15-56): CSV -> infer schema -> typed write
through BOTH typed sinks (avro + container/parquet-analog) -> read back ->
field equality across both paths."""

import pyarrow as pa

from plugin_serdes_ray.container import read_partition, write_partition
from plugin_serdes_ray.functions.coerce import coerce_table
from plugin_serdes_ray.functions.infer import infer_rows, to_arrow_schema
from plugin_serdes_ray.plan import build_plan
from plugin_serdes_ray.sinks.avro_ import table_to_avro_bytes
from plugin_serdes_ray.sinks.csv_ import table_to_csv_bytes
from plugin_serdes_ray.sources.avro_ import read_avro_records
from plugin_serdes_ray.sources.csv_ import CsvOptions, parse_csv_bytes
from plugin_serdes_ray.testing import tables_equal

CSV = b"""id,name,score,active,joined
1,alice,9.5,true,2024-01-02T03:04:05.000000
2,bob,7.25,false,2024-02-03T04:05:06.000000
3,,4.0,true,2024-03-04T05:06:07.000000
"""


def test_schema_inference_roundtrip(tmp_path):
    # CSV -> rows (string-typed like the reference's ION hub)
    raw = parse_csv_bytes(CSV, CsvOptions(infer_types=False))
    rows = raw.to_pylist()

    # infer (InferAvroSchema analog) over the dynamic rows
    typed_rows = [
        {"id": int(r["id"]), "name": r["name"] or None,  # "" -> null on the
         # typed path (the reference's nullValues list treats "" as null)
         "score": float(r["score"]),
         "active": r["active"] == "true", "joined": r["joined"]}
        for r in rows
    ]
    root = infer_rows(typed_rows)
    schema = to_arrow_schema(root)
    assert schema.field("name").nullable

    # typed table via the coercion layer
    target = pa.schema([
        ("id", pa.int64()), ("name", pa.string()), ("score", pa.float64()),
        ("active", pa.bool_()), ("joined", pa.timestamp("us")),
    ])
    typed = coerce_table(raw, target)
    assert typed.column("name").to_pylist() == ["alice", "bob", None]

    # path A: avro container
    blob = table_to_avro_bytes(typed)
    _, back_rows = read_avro_records(blob)
    back_avro = coerce_table(pa.Table.from_pylist(back_rows), target)

    # path B: the columnar container engine
    plan = build_plan(typed)
    path = str(tmp_path / "t.grck")
    write_partition(typed, path, plan.codecs, plan.context())
    back_container = read_partition(path)

    # field equality across both paths (the yaml flow's assertion)
    assert tables_equal(typed, back_avro)
    assert tables_equal(typed, back_container)
    assert tables_equal(back_avro, back_container)


def test_csv_to_typed_roundtrip_text_identity():
    """Typed write -> CSV -> reparse -> coerce == original (the reference's
    FullIonConversion identity modulo the documented lossy float->string)."""
    t = pa.table({
        "a": pa.array([1, 2, None], type=pa.int64()),
        "s": pa.array(["x", None, "z"]),
        "f": pa.array([1.5, -0.25, 3.75]),
    })
    back = parse_csv_bytes(table_to_csv_bytes(t))
    out = coerce_table(back, t.schema)
    assert tables_equal(t, out)
