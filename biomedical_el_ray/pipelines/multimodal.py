"""Multimodal-column plumbing (binary payloads + decode actor pool).

Treats media as opaque ``binary`` columns with typed metadata, decoded by a
stateful actor-pool ``map_batches`` stage.  The decode seam handles two
REAL formats — PNG (full stdlib-zlib decode incl. scanline unfiltering,
``functions/imagecodec.py``) and JPEG (SOF header dimensions) — plus the
deterministic fake container used by the synthetic pipeline.  A
PIL/torchaudio/ffmpeg codec drops in behind the same ``_decode_payload``
seam; unknown formats raise ``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from biomedical_el_ray.functions.hashing import stable_seed
from biomedical_el_ray.sources.readers import read_table

_MAGIC = b"FIMG"  # fake-image container: magic | u16 width | u16 height | pixels


def make_payloads(sf_dir: str):
    """documents -> (doc_id, payload:binary) with deterministic fake images.

    Width/height derive from a doc-keyed seed; 'pixels' are seeded bytes.
    Binary columns force small batches downstream (memory-aware: a batch x
    concurrency of payloads must fit the worker heap).
    """
    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])

    def _gen(t: pa.Table) -> pa.Table:
        payloads = []
        for doc_id, n_chars in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()):
            rng = np.random.default_rng(stable_seed("payload", doc_id))
            w = 8 + int(rng.integers(0, 24))
            h = 8 + int(rng.integers(0, 24))
            body = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
            payloads.append(_MAGIC + struct.pack("<HH", w, h) + body)
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(payloads, pa.binary())],
            names=["doc_id", "payload"],
        )

    return docs.map_batches(_gen, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode stage; expensive codec state belongs in __init__."""

    def __init__(self):
        # codec table built once per actor (A1/A2-analog of per-process
        # tokenizer/model state, /root/reference/data_preprocessing.py:13-14);
        # sniffed by payload prefix, longest prefix first
        from biomedical_el_ray.functions.imagecodec import (
            PNG_SIG, decode_jpeg_header, decode_png,
        )

        self.codecs = [
            (PNG_SIG, decode_png),
            (b"\xff\xd8\xff", decode_jpeg_header),
            (_MAGIC, self._decode_fake),
        ]

    @staticmethod
    def _decode_fake(payload: bytes):
        w, h = struct.unpack_from("<HH", payload, 4)
        pixels = np.frombuffer(payload, dtype=np.uint8, offset=8)
        return w, h, float(pixels.mean()) if pixels.size else 0.0

    def _decode_payload(self, payload: bytes):
        for prefix, codec in self.codecs:
            if payload[: len(prefix)] == prefix:
                return codec(payload)
        raise NotImplementedError(
            f"no codec for prefix {payload[:4]!r}: supported formats are "
            "PNG, JPEG (header), and the synthetic FIMG container"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, means, sizes = [], [], [], []
        for p in t["payload"].to_pylist():
            w, h, m = self._decode_payload(p)
            ws.append(w)
            hs.append(h)
            means.append(m)
            sizes.append(len(p))
        return pa.Table.from_arrays(
            [
                t["doc_id"],
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array(sizes, pa.int64()),
                pa.array(means, pa.float64()),
            ],
            names=["doc_id", "width", "height", "n_bytes", "mean_pixel"],
        )


def decode_media(sf_dir: str, batch_size: int = 256, concurrency=(1, 4)):
    """(doc_id, width, height, n_bytes, mean_pixel) — rows-only query.

    Small ``batch_size``: payload batches are large-binary; batch x pool
    must fit in worker heaps (SURVEY.md §4 memory pressure).
    """
    return make_payloads(sf_dir).map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
