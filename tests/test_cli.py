"""Job-submit CLI: the linkage command checkpoints + resumes and writes
partitioned parquet with a metrics ledger; the query command runs any
driver-contract entry.  cmd_* functions are driven directly under the
session Ray fixture (main() owns init/shutdown, which belongs to real
job submission, not to tests)."""

import argparse
import json
import os

import pyarrow.parquet as pq
import pytest

from biomedical_el_ray.__main__ import cmd_linkage, cmd_query
from biomedical_el_ray.sources.synthetic import CorpusSpec, ensure_corpus


@pytest.fixture(scope="module")
def corpus():
    return str(ensure_corpus(CorpusSpec(n_convs=20)))


def test_cli_linkage_writes_output_and_metrics(ray_session, corpus, tmp_path):
    args = argparse.Namespace(
        corpus=corpus,
        workdir=str(tmp_path / "work"),
        output=str(tmp_path / "out"),
    )
    m = cmd_linkage(args)
    assert m["output"]["rows"] > 0
    assert m["output"]["partitions"] >= 1
    assert m["resumed"] == {
        "mentions": False, "scored_pairs": False, "clusters": False,
    }
    # metrics ledger on disk next to the data
    ledger = json.loads((tmp_path / "out" / "metrics.json").read_text())
    assert ledger["output"]["rows"] == m["output"]["rows"]
    # the output really is partitioned parquet
    files = [f for f in os.listdir(tmp_path / "out") if f.endswith(".parquet")]
    assert files
    total = sum(
        pq.read_metadata(tmp_path / "out" / f).num_rows for f in files
    )
    assert total == m["output"]["rows"]

    # resubmit: every stage resumes from its manifest, same row count
    m2 = cmd_linkage(args)
    assert m2["resumed"] == {
        "mentions": True, "scored_pairs": True, "clusters": True,
    }
    assert m2["output"]["rows"] == m["output"]["rows"]


def test_cli_query_runs_any_entry(ray_session, tmp_path):
    args = argparse.Namespace(
        name="token_stats",
        sf_dir="/root/testdata/sf0.001",
        output=str(tmp_path / "q"),
    )
    m = cmd_query(args)
    assert m["output"]["rows"] == 500


def test_cli_query_unknown_name(ray_session):
    args = argparse.Namespace(
        name="nope", sf_dir="/root/testdata/sf0.001", output=None
    )
    with pytest.raises(SystemExit):
        cmd_query(args)
