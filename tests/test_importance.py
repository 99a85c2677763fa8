"""importance_weights (DSIR-shaped selection): margin quality and
structural invariants.  Bit-exactness vs DuckDB is covered by the
oracle-equivalence sweep."""

import duckdb
import numpy as np

from biomedical_el_ray.pipelines.textstats import importance_weights

SF = "/root/testdata/sf0.01"


def test_margin_lifts_target_precision():
    df = importance_weights(SF, target_lang="en").to_pandas()
    lang = duckdb.sql(
        f"SELECT doc_id, lang FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    m = df.merge(lang, on="doc_id")
    en = m["lang"] == "en"
    base = en.mean()
    kept = m["kept"]
    assert kept.sum() > 0
    precision = (kept & en).sum() / kept.sum()
    # the positive-margin set must be substantially enriched in the target
    assert precision > 1.4 * base, (precision, base)
    # and target docs must score higher in aggregate
    assert m.loc[en, "score_fp"].median() > m.loc[~en, "score_fp"].median()


def test_all_docs_scored_once():
    df = importance_weights(SF).to_pandas()
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert len(df) == n
    assert df["doc_id"].is_unique
    assert (df["kept"] == (df["score_fp"] > 0)).all()
    assert (df["n_grams"] >= 0).all()
    assert np.issubdtype(df["score_fp"].dtype, np.integer)
