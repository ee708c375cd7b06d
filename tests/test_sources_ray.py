"""Distributed (Ray Dataset) paths of the format sources — one parse task
per file, files as the partition unit."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def customer(sf_dir):
    return pq.read_table(f"{sf_dir}/customer.parquet")


def test_read_csv_distributed(ray_session, customer, tmp_path):
    from plugin_serdes_ray.sinks.csv_ import table_to_csv_bytes
    from plugin_serdes_ray.sources.csv_ import read_csv

    paths = []
    for i in range(3):  # three shards
        p = str(tmp_path / f"c{i}.csv")
        open(p, "wb").write(table_to_csv_bytes(customer.slice(i * 50, 50)))
        paths.append(p)
    ds = read_csv(paths)
    assert ds.count() == 150
    got = sorted(r["c_custkey"] for r in ds.take_all())
    assert got == sorted(customer.column("c_custkey").to_pylist())


def test_read_json_array_mode_distributed(ray_session, customer, tmp_path):
    from plugin_serdes_ray.sinks.json_ import JsonWriteOptions, table_to_json_bytes
    from plugin_serdes_ray.sources.json_ import JsonOptions, read_json

    p = str(tmp_path / "c.json")
    open(p, "wb").write(table_to_json_bytes(
        customer, JsonWriteOptions(newline_delimited=False)))
    ds = read_json(p, JsonOptions(newline_delimited=False))
    assert ds.count() == customer.num_rows


def test_read_yaml_distributed(ray_session, tmp_path):
    from plugin_serdes_ray.sources.yaml_ import read_yaml

    for i in range(2):
        open(tmp_path / f"d{i}.yaml", "w").write("a: 1\n---\na: 2\n")
    ds = read_yaml([str(tmp_path / "d0.yaml"), str(tmp_path / "d1.yaml")])
    assert ds.count() == 4


def test_read_avro_distributed(ray_session, customer, tmp_path):
    from plugin_serdes_ray.sinks.avro_ import table_to_avro_bytes
    from plugin_serdes_ray.sources.avro_ import read_avro

    p = str(tmp_path / "c.avro")
    open(p, "wb").write(table_to_avro_bytes(customer))
    ds = read_avro(p)
    assert ds.count() == customer.num_rows


def test_read_xml_distributed(ray_session, tmp_path):
    from plugin_serdes_ray.sources.xml_ import XmlOptions, read_xml

    xml = b"<cat><item><a>1</a></item><item><a>2</a></item></cat>"
    p = str(tmp_path / "d.xml")
    open(p, "wb").write(xml)
    ds = read_xml(p, XmlOptions(query="/cat/item"))
    assert sorted(r["a"] for r in ds.take_all()) == [1, 2]


def test_read_excel_distributed(ray_session, tmp_path):
    from plugin_serdes_ray.sinks.excel_ import tables_to_xlsx_bytes
    from plugin_serdes_ray.sources.excel_ import read_excel

    t = pa.table({"x": [1, 2, 3]})
    p = str(tmp_path / "d.xlsx")
    open(p, "wb").write(tables_to_xlsx_bytes({"S": t}))
    ds = read_excel(p, sheet="S")
    assert ds.count() == 3


def test_orc_roundtrip_and_distributed_read(ray_session, tmp_path, sf_dir):
    import pyarrow.parquet as pq

    from plugin_serdes_ray.sinks.orc_ import table_to_orc_bytes, write_orc
    from plugin_serdes_ray.sources.orc_ import parse_orc_bytes, read_orc
    from plugin_serdes_ray.testing import arrays_equal

    src = pq.read_table(f"{sf_dir}/supplier.parquet")
    back = parse_orc_bytes(table_to_orc_bytes(src))
    for c in src.column_names:
        assert arrays_equal(back.column(c).combine_chunks(),
                            src.column(c).combine_chunks()), c
    p = str(tmp_path / "s.orc")
    write_orc(src, p)
    ds = read_orc([p], columns=["s_suppkey"])
    assert sorted(r["s_suppkey"] for r in ds.take_all()) == \
        sorted(src.column("s_suppkey").to_pylist())


def test_feather_roundtrip_and_distributed_read(ray_session, tmp_path, sf_dir):
    import pyarrow.parquet as pq

    from plugin_serdes_ray.sinks.feather_ import (
        table_to_feather_bytes, write_feather,
    )
    from plugin_serdes_ray.sources.feather_ import (
        parse_feather_bytes, read_feather,
    )
    from plugin_serdes_ray.testing import arrays_equal

    src = pq.read_table(f"{sf_dir}/nation.parquet")
    back = parse_feather_bytes(table_to_feather_bytes(src))
    for c in src.column_names:
        assert arrays_equal(back.column(c).combine_chunks(),
                            src.column(c).combine_chunks()), c
    p = str(tmp_path / "n.feather")
    write_feather(src, p)
    assert read_feather([p]).count() == src.num_rows


def test_convert_fleet_parquet_to_orc(ray_session, sf_dir, tmp_path):
    from plugin_serdes_ray.pipelines.convert import convert_files
    from plugin_serdes_ray.sources.orc_ import read_orc_table

    out = convert_files([f"{sf_dir}/region.parquet"], str(tmp_path),
                        "parquet", "orc", concurrency=1)
    assert out["converted"] == 1 and out["rows"] == 5
    t = read_orc_table(out["outputs"][0])
    assert t.num_rows == 5 and "r_name" in t.column_names
