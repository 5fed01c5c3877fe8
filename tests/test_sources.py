"""Source/sink registry round-trips (SURVEY.md §2.1 inventory)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from silk_ray.sources import (
    peak,
    read_dataset,
    retrieve_by_uri,
    retrieve_paths,
    sample_entities,
    write_dataset,
)


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    t = pa.table(
        {
            "uri": [f"u{i}" for i in range(100)],
            "name": [f"name-{i}" for i in range(100)],
            "val": list(range(100)),
        }
    )
    d = tmp_path_factory.mktemp("src")
    pq.write_table(t, os.path.join(d, "data.parquet"))
    return t, str(d)


def test_parquet_roundtrip(ray_session, table, tmp_path):
    t, d = table
    ds = read_dataset(os.path.join(d, "data.parquet"), "parquet", columns=["uri", "val"])
    assert ds.count() == 100
    assert set(ds.schema().names) == {"uri", "val"}
    out = str(tmp_path / "out")
    write_dataset(ds, out, "parquet")
    back = read_dataset(out, "parquet")
    assert back.count() == 100


def test_csv_json_sinks(ray_session, table, tmp_path):
    t, d = table
    ds = read_dataset(os.path.join(d, "data.parquet"), "parquet")
    csv_dir = str(tmp_path / "csv")
    write_dataset(ds, csv_dir, "csv")
    back = read_dataset(csv_dir, "csv", columns=["uri", "name"])
    assert back.count() == 100
    json_dir = str(tmp_path / "json")
    write_dataset(ds, json_dir, "json")
    assert read_dataset(json_dir, "json").count() == 100


def test_text_files_whole_file(ray_session, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.txt").write_text(f"file {i} contents\nline two")
    ds = read_dataset(str(tmp_path), "text_files")
    rows = ds.take_all()
    assert len(rows) == 3
    assert any("file 1 contents" in r["text"] for r in rows)


def test_limit_peak_sample(ray_session, table):
    _t, d = table
    ds = read_dataset(os.path.join(d, "data.parquet"), "parquet", limit=7)
    assert ds.count() == 7
    full = read_dataset(os.path.join(d, "data.parquet"), "parquet")
    assert len(peak(full, 3)) == 3
    s = sample_entities(full, 0.3, seed=1)
    assert 10 <= s.count() <= 60


def test_retrieve_by_uri(ray_session, table):
    _t, d = table
    ds = read_dataset(os.path.join(d, "data.parquet"), "parquet")
    out = retrieve_by_uri(ds, "uri", {"u3", "u7", "u99"}).to_pandas()
    assert sorted(out.uri) == ["u3", "u7", "u99"]


def test_retrieve_paths(ray_session, table):
    _t, d = table
    ds = read_dataset(os.path.join(d, "data.parquet"), "parquet")
    out = retrieve_paths(ds)
    assert set(out.path) == {"uri", "name", "val"}
    assert (out.n == 100).all()


def test_xml_source_and_sink(tmp_path):
    # XmlSourceStreaming.scala semantics: base path selects entity
    # nodes; attributes -> @cols, child tags -> text columns.
    xml = """<?xml version="1.0"?>
<Persons>
  <Person id="p1"><Name>Ada</Name><Phone>1</Phone><Phone>2</Phone></Person>
  <Person id="p2"><Name>Bob</Name></Person>
</Persons>"""
    src = tmp_path / "persons.xml"
    src.write_text(xml)
    from silk_ray.sources.registry import read_dataset, write_dataset

    ds = read_dataset(str(src), "xml", base_path="/Persons/Person")
    df = ds.to_pandas().sort_values("@id").reset_index(drop=True)
    assert list(df["@id"]) == ["p1", "p2"]
    assert list(df["Name"]) == ["Ada", "Bob"]
    assert df["Phone"][0] == "1"  # first occurrence in single-valued mode

    multi = read_dataset(str(src), "xml", base_path="/Persons/Person", multi_valued=True)
    mrows = sorted(multi.take_all(), key=lambda r: r["@id"])
    assert list(mrows[0]["Phone"]) == ["1", "2"]

    # sink roundtrip
    out_dir = tmp_path / "out"
    parts = write_dataset(ds.drop_columns(["_file"]), str(out_dir), "xml")
    assert sum(p["rows"] for p in parts) == 2
    back = read_dataset(str(out_dir), "xml", base_path="/Entities/Entity")
    bdf = back.to_pandas().sort_values("@id").reset_index(drop=True)
    assert list(bdf["Name"]) == ["Ada", "Bob"]
