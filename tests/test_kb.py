"""Entity-KB TSV reader (S2) — parity with the reference loader on the
REAL BC5CDR entities.txt plus the 3-column dataset variant."""

from __future__ import annotations

import pyarrow as pa

from biomedical_el_ray.sources.kb import (
    _parse_kb_lines, entities_dict, kb_table, read_entities_tsv,
)

BC5CDR = "/root/reference/data/BC5CDR/raw_data/entities.txt"


def test_bc5cdr_row_count_and_shape():
    t = kb_table(BC5CDR)
    assert t.num_rows == 29054  # wc -l of the reference file
    assert t.column_names == ["entity_id", "name"]
    d = dict(zip(t["entity_id"].to_pylist(), t["name"].to_pylist()))
    assert d["D004961"] == "Estramustine"
    assert d["D019305"] == "Epilepsy, Rolandic"


def test_entities_dict_matches_reference_loop():
    ref = {}
    with open(BC5CDR, encoding="utf-8") as f:
        for line in f:
            e, text = line.strip().split("\t")
            ref[e] = text
    assert entities_dict(BC5CDR) == ref


def test_three_column_variant_per_line(tmp_path):
    p = tmp_path / "entities.txt"
    p.write_text(
        "C001\tSTY1\tAspirin\n"
        "C002\tacetylsalicylic acid\n"      # 2-col row in the same file
        "C003\tSTY2\tIbuprofen\n",
        encoding="utf-8",
    )
    t = kb_table(str(p))
    d = dict(zip(t["entity_id"].to_pylist(), t["name"].to_pylist()))
    assert d == {"C001": "Aspirin", "C002": "acetylsalicylic acid",
                 "C003": "Ibuprofen"}


def test_parse_kb_lines_drops_blank_lines():
    t = _parse_kb_lines(pa.table({"text": ["", "A\tB", ""]}))
    assert t.to_pylist() == [{"entity_id": "A", "name": "B"}]


def test_feeds_link_topk(tmp_path):
    from biomedical_el_ray.pipelines.linking import link_topk

    p = tmp_path / "entities.txt"
    p.write_text("E1\tdiabetes mellitus\nE2\tarterial hypertension\n",
                 encoding="utf-8")
    kb = kb_table(str(p))
    import ray.data as rd

    surfaces = rd.from_arrow(pa.table({"surface": ["diabetes melitus"]}))
    out = link_topk(surfaces, kb, k=1).to_pandas()
    assert out.iloc[0]["entity_id"] == "E1"
