"""Property-based parity: the hand-rolled SQL reproductions must match
their numpy kernels on arbitrary inputs, not just the corpus.

Each test draws a batch of strings and compares in ONE DuckDB query
(per-example round-trips would dominate runtime).
"""

import sys

import duckdb
import pyarrow as pa
from hypothesis import given, settings, strategies as st

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.functions.hashing import hash64_column  # noqa: E402
from biomedical_el_ray.functions.sql_hash import hash64_short_cte  # noqa: E402
from biomedical_el_ray.pipelines.windows import norm_offset_of  # noqa: E402

# strings whose utf-8 encoding stays <= 64 bytes (the vectorized-hash
# length class hash64_short_cte reproduces)
short_text = st.text(min_size=0, max_size=16).filter(
    lambda s: len(s.encode("utf-8", "surrogatepass")) <= 64 and "\x00" not in s
)


@settings(deadline=None, max_examples=25)
@given(st.lists(short_text, min_size=1, max_size=20, unique=True))
def test_sql_hash_matches_numpy(tokens):
    expect = {t: int(h) for t, h in zip(tokens, hash64_column(tokens))}
    con = duckdb.connect()
    con.register("toks", pa.table({"tok": pa.array(tokens, pa.string())}))
    cte, rel = hash64_short_cte("toks", [], "h_")
    got = dict(con.execute(f"WITH {cte} SELECT tok, {rel}.h FROM {rel}").fetchall())
    assert {k: int(v) for k, v in got.items()} == expect


ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


@settings(deadline=None, max_examples=50)
@given(ascii_text)
def test_norm_offset_matches_prefix_formula(text):
    """The span-overlap oracle rebases gold offsets with
    ``len(normalize(text[:i+1])) - 1`` for a non-space char at raw index
    i; that must equal ``norm_offset_of``'s map at every non-space
    position (and the exclusive-end formula at every span end)."""
    import re

    def norm(s: str) -> str:
        return re.sub(r"\s+", " ", s.strip().lower())

    m = norm_offset_of(text)
    for i, ch in enumerate(text):
        if not ch.isspace():
            assert m[i] == len(norm(text[: i + 1])) - 1, (text, i)
            # exclusive end just past this char
            assert m[i] + 1 == len(norm(text[: i + 1])), (text, i)
