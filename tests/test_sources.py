"""PubTator source parser + winnowing fingerprints."""

import numpy as np

from biomedical_el_ray.functions.fingerprint import winnow, winnow_similarity
from biomedical_el_ray.sources.pubtator import read_pubtator

PUBTATOR_SAMPLE = """\
1001|t|Famotidine associated delirium
1001|a|A series of patients is reported.
1001\t0\t10\tFamotidine\tChemical\tD015738
1001\t22\t30\tdelirium\tDisease\tD003693
1001\t5\t9\tskip\tDisease\t-1
1002|t|Second title
1002|a|Second abstract text.
1002\t0\t6\tSecond\tChemical\tD111+D222
1002\t7\t12\ttitle\tDisease\tD333|D444

"""


def test_pubtator_parse(tmp_path):
    f = tmp_path / "corpus.txt"
    f.write_text(PUBTATOR_SAMPLE)
    docs, mentions = read_pubtator(str(f))
    d = {r["document_id"]: r["text"] for r in docs.take_all()}
    # title + ' ' + abstract (reference data_preprocessing.py:34-43)
    assert d["1001"] == "Famotidine associated delirium A series of patients is reported."
    assert d["1002"] == "Second title Second abstract text."

    m = sorted(mentions.take_all(), key=lambda r: (r["document_id"], r["start"]))
    # the -1 label row is dropped (data_preprocessing.py:48-49)
    assert len(m) == 4
    assert m[0]["text"] == "Famotidine" and m[0]["concept_id"] == "D015738"
    # compound ids normalized to first (data_preprocessing.py:65-68)
    assert m[2]["concept_id"] == "D111"
    assert m[3]["concept_id"] == "D333"
    # offset invariant against assembled text (utils_e2e_span.py:96)
    for r in m:
        assert d[r["document_id"]][r["start"] : r["end"]] == r["text"]


def test_pubtator_malformed_input_rule(tmp_path):
    """Documented malformed-input semantics (ADVICE r4): duplicate
    (doc, segment) lines keep the lexicographically smallest text —
    deterministic at ANY partitioning because seg_text is in the sort
    key — null segments are skipped (none are producible from the line
    grammar), and an empty abstract line still joins (reference's
    unconditional ``title + ' ' + abstract``)."""
    import pyarrow as pa

    from biomedical_el_ray.sources.pubtator import _assemble_docs

    t = pa.table({
        "document_id": ["9", "9", "9", "8", "8", "7"],
        "segment":     ["t", "t", "a", "t", "a", "t"],
        "seg_text":    ["zz dup title", "aa dup title", "abstract.",
                        "only title", None, ""],
        "dkey": pa.array([0] * 6, pa.int64()),
    })
    out = {r["document_id"]: r["text"]
           for r in _assemble_docs(t).to_pylist()}
    assert out["9"] == "aa dup title abstract."   # smallest dup survives
    assert out["8"] == "only title"               # null segment skipped
    assert out["7"] == ""                         # empty title kept as-is


def test_winnow_deterministic_and_robust():
    a = "the quick brown fox jumps over the lazy dog"
    f1, f2 = winnow(a), winnow(a)
    assert np.array_equal(f1, f2)
    assert len(f1) > 0
    # winnowed sets shrink vs raw k-grams
    from biomedical_el_ray.functions.fingerprint import kgram_hashes

    assert len(f1) < len(kgram_hashes(a))


def test_winnow_similarity_ordering():
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = a.replace("lazy", "lzay")  # small local edit
    c = "completely different content with no shared phrasing at all here"
    assert winnow_similarity(a, a) == 1.0
    assert winnow_similarity(a, b) > winnow_similarity(a, c)
    assert winnow_similarity(a, c) < 0.2


def test_winnow_near_dup_pairs_are_similar():
    """Every pair surfaced by the distributed winnow pipeline must share
    fingerprints under the direct (single-node) winnow computation too."""
    from biomedical_el_ray.functions.fingerprint import winnow
    from biomedical_el_ray.pipelines.dedup import winnow_near_dup
    import pyarrow.parquet as pq

    from collections import Counter

    sf = "/root/testdata/sf0.001"
    pairs = winnow_near_dup(sf).take_all()
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    sketch = {
        d: set(winnow(t).astype("int64")[:24].tolist()) for d, t in texts.items()
    }
    df = Counter(fp for s in sketch.values() for fp in s)
    rare = {fp for fp, c in df.items() if c <= 32}  # max_df default
    for r in pairs:
        fa = sketch[r["doc_lo"]] & rare
        fb = sketch[r["doc_hi"]] & rare
        assert len(fa & fb) == r["n_shared"], r


def test_winnow_oracle_matches_kernels_edge_cases():
    """The winnow-dedup SQL oracle must reproduce the kernel chain
    (positional k-grams -> window minima -> bottom sketch -> df cap ->
    shared-count pairs) including the len(h) <= w whole-doc-min branch."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from biomedical_el_ray.functions.fingerprint import (
        winnow,
        winnow_dedup_oracle_sql,
    )

    base = "the quick brown fox jumps over the lazy dog and runs away fast"
    texts = [
        base,
        base.replace("lazy", "hazy"),
        base,                               # exact dup
        "tiny",                             # len(h) <= w branch
        "tiny",                             # pairs with the other tiny doc
        "unrelated content about database engines and shuffles",
    ]
    ids = [4, 8, 15, 16, 23, 42]
    k, w, max_fps, min_shared, max_df = 5, 8, 24, 2, 32
    sketches = {
        d: set(winnow(t, k, w)[:max_fps].tolist()) for d, t in zip(ids, texts)
    }
    # df cap (no fp is hot in this corpus, but apply it anyway for fidelity)
    from collections import Counter
    df = Counter(fp for s in sketches.values() for fp in s)
    expected = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            shared = [
                fp for fp in sketches[ids[i]] & sketches[ids[j]]
                if df[fp] <= max_df
            ]
            if len(shared) >= min_shared:
                lo, hi = sorted((ids[i], ids[j]))
                expected[(lo, hi)] = len(shared)
    con = duckdb.connect()
    con.register("documents", pa.table({"doc_id": ids, "text": texts}))
    got = {
        (a, b): n
        for a, b, n in con.sql(winnow_dedup_oracle_sql("documents")).fetchall()
    }
    assert got == expected
    assert (4, 15) in got  # exact dup pair survives
