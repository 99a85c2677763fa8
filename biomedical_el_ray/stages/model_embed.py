"""Real-model embedder seam (A2 torch path) behind the HashEmbedder interface.

The reference's dual encoder embeds mentions and candidates with two
BERTs loaded once per process (/root/reference/modeling_e2e_span.py:17-29;
weights loaded once before the scoring loop at run_e2e_span.py:343-366).
This module is the drop-in seam for that model class: a ``ModelEmbedder``
exposes the exact ``HashEmbedder`` surface the scorer and blocker consume
(``.dim``, ``.embed(surfaces) -> (n, dim) float32 L2-normalized``,
``.proj_int`` (None -> float scoring path), ``.bucket_values``/
``.buckets`` sign-bit LSH, ``.cosine``) while loading an arbitrary
encoder ONCE per actor via a named loader from ``MODEL_LOADERS``.

Loaders are zero-arg callables returning an object with
``encode(list[str], batch_size=int) -> (n, d) array`` — the public
sentence-transformers contract.  ``torch_minilm_loader`` implements it
for a MiniLM-class sentence encoder and is import-gated: this container
has no torch, so constructing it raises a clear ImportError; the seam
itself (actor-pool state semantics, batch plumbing, GPU resource tags)
is exercised by tests through a deterministic fake loader.

Select the model path per pipeline with
``PipelineConfig(embed_projection="model:<loader-name>")``.
"""

from __future__ import annotations

import numpy as np

from biomedical_el_ray.stages.embed import HashEmbedder

# name -> zero-arg factory returning an ``encode``-capable model object.
# Registration is process-local; actors re-register via the module import
# (loaders must be importable top-level functions, not closures, so the
# name resolves identically on every worker).
MODEL_LOADERS: dict = {}


def register_model_loader(name: str, factory) -> None:
    """Register ``factory`` under ``name`` for ``model:<name>`` configs."""
    MODEL_LOADERS[name] = factory


def torch_minilm_loader():
    """Load a public MiniLM-class sentence encoder (torch path).

    Import-gated: raises ImportError with guidance when torch /
    sentence-transformers are absent (as in this container).  On a
    GPU-equipped cluster, pass ``num_gpus>0`` to ``embed_texts`` so Ray
    schedules one actor per GPU and the model loads onto it once."""
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:  # pragma: no cover - torch not in container
        raise ImportError(
            "the torch embedder path needs `sentence-transformers` (and "
            "torch) installed; install them or use the deterministic "
            "hash-projection embedder (embed_projection='rademacher')"
        ) from e
    return SentenceTransformer("sentence-transformers/all-MiniLM-L6-v2")


register_model_loader("minilm", torch_minilm_loader)


class HashModelStandin:
    """Deterministic ``encode``-contract model backed by HashEmbedder —
    lets tests drive the model seam end-to-end without torch, producing
    embeddings identical to the flagship's own projection (so the
    F1-vs-oracle gate must pass through the model path too)."""

    def __init__(self, dim: int = 64):
        self._h = HashEmbedder(dim=dim)
        self.dim = dim

    def encode(self, texts, batch_size: int = 256) -> np.ndarray:
        return self._h.embed(list(texts))


register_model_loader("hash-standin", lambda: HashModelStandin())


class ModelEmbedder:
    """HashEmbedder-interface adaptor over a loaded encoder model.

    The model loads ONCE per constructing actor/worker (``__init__``);
    ``embed`` runs batched inference and L2-normalizes so downstream dot
    products are cosines, exactly like ``HashEmbedder.embed``."""

    # float scoring path marker (PairScorer checks ``proj_int is None``)
    proj_int = None

    def __init__(self, loader_name: str, encode_batch_size: int = 256):
        try:
            factory = MODEL_LOADERS[loader_name]
        except KeyError:
            raise ValueError(
                f"no model loader registered under {loader_name!r}; "
                f"known: {sorted(MODEL_LOADERS)}"
            ) from None
        self.model = factory()
        self.encode_batch_size = encode_batch_size
        # probe the output width once (models expose it inconsistently)
        self.dim = int(np.asarray(self.model.encode([""]))[0].shape[-1])

    def embed(self, surfaces) -> np.ndarray:
        if len(surfaces) == 0:
            return np.empty((0, self.dim), dtype=np.float32)
        emb = np.asarray(
            self.model.encode(list(surfaces), batch_size=self.encode_batch_size),
            dtype=np.float32,
        )
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        np.maximum(norms, 1e-12, out=norms)
        return emb / norms

    # sign-bit LSH buckets and cosine: same public surface as HashEmbedder
    bucket_values = HashEmbedder.bucket_values
    buckets = HashEmbedder.buckets
    _EB_SALT = HashEmbedder._EB_SALT

    def cosine(self, a_surfaces, b_surfaces) -> np.ndarray:
        ea = self.embed(a_surfaces)
        eb = self.embed(b_surfaces)
        return np.einsum("ij,ij->i", ea, eb)


def build_embedder(cfg):
    """PipelineConfig -> scorer/blocker embedder (the A2 plan choice).

    ``embed_projection`` of ``"model:<name>"`` selects the registered
    model loader; anything else builds the deterministic HashEmbedder."""
    proj = cfg.embed_projection
    if proj.startswith("model:"):
        return ModelEmbedder(proj[len("model:"):])
    return HashEmbedder(
        cfg.embed_dim, cfg.embed_features, cfg.embed_seed, cfg.shingle_k, proj
    )


class _TextEncoderActor:
    """map_batches actor: encode ``text_col`` -> fixed-width embedding."""

    def __init__(self, loader_name: str, text_col: str, out_col: str,
                 encode_batch_size: int):
        self.embedder = ModelEmbedder(loader_name, encode_batch_size)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch):
        import pyarrow as pa

        texts = batch[self.text_col].to_pylist()
        emb = self.embedder.embed(texts)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(emb.ravel(), pa.float32()), emb.shape[1] or 1
        )
        return batch.append_column(self.out_col, col)


def embed_texts(ds, loader_name: str, text_col: str = "text",
                out_col: str = "embedding", batch_size: int = 256,
                concurrency=None, num_gpus: float = 0):
    """Dataset -> Dataset with an embedding column (actor-pool stage).

    The model loads once per actor (``_TextEncoderActor.__init__``);
    ``num_gpus > 0`` tags each actor with a GPU share so Ray places one
    model replica per GPU — the distributed form of the reference's
    load-weights-then-loop inference (run_e2e_span.py:343-366).  Batch
    size bounds actor heap (activations scale with batch x seq_len)."""
    from biomedical_el_ray.util import resolve_concurrency

    kwargs = dict(
        fn_constructor_kwargs={
            "loader_name": loader_name, "text_col": text_col,
            "out_col": out_col, "encode_batch_size": batch_size,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=resolve_concurrency(concurrency),
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(_TextEncoderActor, **kwargs)


# ---------------------------------------------------------------------------
# cross-encoder scorer seam (retrieve-then-rerank second stage)
# ---------------------------------------------------------------------------

# name -> zero-arg factory returning an object with
# ``score_pairs(queries: pa.Array, docs: pa.Array) -> np.int64 array``
# (fixed-point scores: integer algebra keeps distributed reranks
# combine-order-free and the standin's DuckDB twin bit-exact).
CROSS_SCORERS: dict = {}


def register_cross_scorer(name: str, factory) -> None:
    """Register ``factory`` under ``name`` for rerank ``scorer=`` configs."""
    CROSS_SCORERS[name] = factory


def torch_cross_encoder_loader():
    """Load a public MS-MARCO MiniLM cross-encoder (torch path).

    Import-gated like ``torch_minilm_loader``: this container has no
    torch, so constructing it raises a clear ImportError; the seam's
    actor-pool semantics are exercised through the deterministic standin.
    Scores are quantized to 1e-6 fixed point so the rerank contract stays
    integer."""
    try:
        from sentence_transformers import CrossEncoder
    except ImportError as e:  # pragma: no cover - torch not in container
        raise ImportError(
            "the cross-encoder rerank path needs `sentence-transformers` "
            "(and torch); install them or use scorer='hash-ce'"
        ) from e

    class _TorchCE:
        def __init__(self):
            self._m = CrossEncoder("cross-encoder/ms-marco-MiniLM-L-6-v2")

        def score_pairs(self, queries, docs):
            import numpy as np

            pairs = list(zip(
                (queries.to_pylist() if hasattr(queries, "to_pylist")
                 else list(queries)),
                (docs.to_pylist() if hasattr(docs, "to_pylist")
                 else list(docs)),
            ))
            s = self._m.predict(pairs)
            return np.rint(np.asarray(s, np.float64) * 1e6).astype(np.int64)

    return _TorchCE()


class HashCrossScorerStandin:
    """Deterministic pair scorer: ``(hash64(q) XOR hash64(d)) & INT64_MAX``
    — both sides <= 64 utf-8 bytes hash through the multilinear
    short-string kernel, so the score is reproducible in DuckDB exactly
    (the XOR of two splitmix-finalized hashes is uniformly mixed).  A
    seam-test default, not a relevance model: it proves the actor-pool
    rerank plumbing end-to-end without torch."""

    def score_pairs(self, queries, docs):
        import numpy as np
        import pyarrow as pa

        from biomedical_el_ray.functions.hashing import hash64_column

        if not isinstance(queries, (pa.Array, pa.ChunkedArray)):
            queries = pa.array(list(queries), pa.string())
        if not isinstance(docs, (pa.Array, pa.ChunkedArray)):
            docs = pa.array(list(docs), pa.string())
        hq = hash64_column(queries)
        hd = hash64_column(docs)
        return ((hq ^ hd) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


register_cross_scorer("msmarco-minilm", torch_cross_encoder_loader)
register_cross_scorer("hash-ce", HashCrossScorerStandin)
