"""Text normalization stage (stateless, zero-copy Arrow).

Analog of the reference's BasicTokenizer normalization chain — clean /
lowercase / whitespace handling (/root/reference/tokenization_bert.py:321-434)
— recast as a vectorized ``map_batches`` over ``pyarrow.compute`` kernels.

Semantics are pinned to be exactly SQL-expressible so the DuckDB oracle can
reproduce them bit-for-bit:

    norm_text = regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')

(pyarrow and DuckDB both use RE2, and both lower() implementations agree on
the corpus alphabet.)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def normalize_array(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """lower -> collapse whitespace runs -> trim. Vectorized, no Python rows."""
    x = pc.utf8_lower(arr)
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(x)


def normalize_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "norm_text"
) -> pa.Table:
    return batch.append_column(out_col, normalize_array(batch[text_col]))


def normalize_transcripts(ds, text_col: str = "text", out_col: str = "norm_text"):
    """Dataset -> Dataset with an added ``norm_text`` column (streaming)."""
    return ds.map_batches(
        normalize_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"text_col": text_col, "out_col": out_col},
    )
