"""Multimodal-column plumbing (binary payloads + decode actor pool).

Treats media as opaque ``binary`` columns with typed metadata, decoded by a
stateful actor-pool ``map_batches`` stage.  The decode seam handles two
REAL formats — PNG (full stdlib-zlib decode incl. scanline unfiltering,
``functions/imagecodec.py``) and JPEG (SOF header dimensions) — plus a
deterministic raw container.  A PIL/torchaudio/ffmpeg codec drops in
behind the same ``_decode_payload`` seam; unknown formats raise
``NotImplementedError``.

The synthetic payload generator derives every byte from splitmix64 of the
doc id, so the full pipeline — generate -> encode (incl. real zlib PNG
compression) -> decode -> aggregate — is DuckDB-oracle checkable
(``decode_media_oracle_sql``): the oracle recomputes the expected decode
output (dimensions, sample count, mean) from the same hash chain, which a
wrong codec path cannot reproduce.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from biomedical_el_ray.functions.hashing import splitmix64
from biomedical_el_ray.sources.readers import read_table

_MAGIC = b"FIMG"  # raw container: magic | u16 width | u16 height | pixels

_MEDIA_SALT = np.uint64(0x4D45_4449_4100_0001)

# payload format per doc: top 2 bits of the geometry hash
_FMT_FIMG = (0, 1)
_FMT_PNG = 2
_FMT_JPEG = 3


def _doc_geometry(doc_ids: np.ndarray):
    """Per-doc (s0, width, height, fmt) — pure splitmix64 of the doc id."""
    s0 = splitmix64(doc_ids.astype(np.uint64) ^ _MEDIA_SALT)
    w = (np.uint64(8) + ((s0 >> np.uint64(1)) & np.uint64(15))).astype(np.int64)
    h = (np.uint64(8) + ((s0 >> np.uint64(8)) & np.uint64(15))).astype(np.int64)
    fmt = (s0 >> np.uint64(62)).astype(np.int64)
    return s0, w, h, fmt


def _doc_pixels(s0: np.uint64, npix: int) -> np.ndarray:
    """Pixel bytes i=1..npix: ``splitmix64(s0 ^ i) & 0xFF``."""
    i = np.arange(1, npix + 1, dtype=np.uint64)
    return (splitmix64(np.uint64(s0) ^ i) & np.uint64(0xFF)).astype(np.uint8)


def make_payloads(sf_dir: str):
    """documents -> (doc_id, payload:binary) deterministic media payloads.

    ~half the docs get the raw FIMG container, a quarter real PNGs
    (grayscale, zlib-compressed, filter type rotating over all five
    scanline filters), a quarter JPEG shells (SOF header carries the
    dimensions).  Binary columns force small batches downstream
    (memory-aware: a batch x concurrency of payloads must fit the worker
    heap).
    """
    from biomedical_el_ray.functions.imagecodec import encode_jpeg_shell, encode_png

    docs = read_table(sf_dir, "documents", ["doc_id"])

    def _gen(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s0, ws, hs, fmts = _doc_geometry(ids)
        payloads = []
        for s, w, h, fmt in zip(s0, ws, hs, fmts):
            w, h = int(w), int(h)
            if fmt == _FMT_JPEG:
                payloads.append(encode_jpeg_shell(w, h))
                continue
            pix = _doc_pixels(s, w * h)
            if fmt == _FMT_PNG:
                payloads.append(
                    encode_png(pix.reshape(h, w), filter_type=int(s >> np.uint64(2)) % 5)
                )
            else:
                payloads.append(_MAGIC + struct.pack("<HH", w, h) + pix.tobytes())
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
            (PNG_SIG, "png", decode_png),
            (b"\xff\xd8\xff", "jpeg", decode_jpeg_header),
            (_MAGIC, "fimg", self._decode_fake),
        ]

    @staticmethod
    def _decode_fake(payload: bytes):
        w, h = struct.unpack_from("<HH", payload, 4)
        pixels = np.frombuffer(payload, dtype=np.uint8, offset=8)
        return w, h, float(pixels.mean()) if pixels.size else 0.0

    def _decode_payload(self, payload: bytes):
        """payload -> (format, width, height, mean | None)."""
        for prefix, name, codec in self.codecs:
            if payload[: len(prefix)] == prefix:
                w, h, mean = codec(payload)
                return name, w, h, mean
        raise NotImplementedError(
            f"no codec for prefix {payload[:4]!r}: supported formats are "
            "PNG, JPEG (header), and the synthetic FIMG container"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        fmts, ws, hs, npx, means = [], [], [], [], []
        for p in t["payload"].to_pylist():
            name, w, h, m = self._decode_payload(p)
            fmts.append(name)
            ws.append(w)
            hs.append(h)
            # header-only decodes (mean is None) yield no samples
            npx.append(w * h if m is not None else 0)
            means.append(m)
        return pa.Table.from_arrays(
            [
                t["doc_id"],
                pa.array(fmts, pa.string()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array(npx, pa.int64()),
                pa.array(means, pa.float64()),
            ],
            names=["doc_id", "format", "width", "height", "n_pixels", "mean_pixel"],
        )


def decode_media(sf_dir: str, batch_size: int = 256, concurrency=(1, 4)):
    """(doc_id, format, width, height, n_pixels, mean_pixel) per document.

    Small ``batch_size``: payload batches are large-binary; batch x pool
    must fit in worker heaps (SURVEY.md §4 memory pressure).  DuckDB
    oracle: ``decode_media_oracle_sql``.
    """
    return make_payloads(sf_dir).map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


_VMAGIC = b"FVID"  # fake-video container: magic | u16 n_frames | u16 w | u16 h | frames
_VIDEO_SALT = np.uint64(0x5649_4445_4F00_0001)


def _video_geometry(doc_ids: np.ndarray):
    s0 = splitmix64(doc_ids.astype(np.uint64) ^ _VIDEO_SALT)
    nf = (np.uint64(4) + ((s0 >> np.uint64(16)) & np.uint64(7))).astype(np.int64)
    w = (np.uint64(4) + ((s0 >> np.uint64(1)) & np.uint64(7))).astype(np.int64)
    h = (np.uint64(4) + ((s0 >> np.uint64(8)) & np.uint64(7))).astype(np.int64)
    return s0, nf, w, h


def make_video_payloads(sf_dir: str):
    """documents -> (doc_id, payload:binary) deterministic multi-frame
    containers (the video analog of ``make_payloads``; a real mp4/ffmpeg
    codec drops in behind the same frame-iterator seam)."""
    docs = read_table(sf_dir, "documents", ["doc_id"])

    def _gen(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s0s, nfs, ws, hs = _video_geometry(ids)
        payloads = []
        for s, nf, w, h in zip(s0s, nfs, ws, hs):
            body = _doc_pixels(s, int(nf) * int(w) * int(h))
            payloads.append(
                _VMAGIC + struct.pack("<HHH", int(nf), int(w), int(h))
                + body.tobytes()
            )
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(payloads, pa.binary())],
            names=["doc_id", "payload"],
        )

    return docs.map_batches(_gen, batch_format="pyarrow", zero_copy_batch=True)


class FrameSampler:
    """Actor-pool frame-sampling stage: decode the container header,
    gather every ``stride``-th frame, emit one row per sampled frame."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, ws, hs, means = [], [], [], [], []
        for doc_id, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            if p[:4] != _VMAGIC:
                raise NotImplementedError(
                    f"no video codec for prefix {p[:4]!r}"
                )
            nf, w, h = struct.unpack_from("<HHH", p, 4)
            frames = np.frombuffer(p, np.uint8, offset=10).reshape(nf, h * w)
            for f in range(0, nf, self.stride):
                ids.append(doc_id)
                fidx.append(f)
                ws.append(w)
                hs.append(h)
                means.append(float(frames[f].mean()))
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(fidx, pa.int64()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array(means, pa.float64()),
            ],
            names=["doc_id", "frame_idx", "width", "height", "mean_frame"],
        )


def sample_frames(sf_dir: str, stride: int = 2, batch_size: int = 256,
                  concurrency=(1, 4)):
    """(doc_id, frame_idx, width, height, mean_frame) for every
    ``stride``-th frame of each synthetic video payload.  DuckDB oracle:
    ``sample_frames_oracle_sql``."""
    return make_video_payloads(sf_dir).map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames_oracle_sql(docs_rel: str = "documents",
                             stride: int = 2) -> str:
    """DuckDB SQL reproducing ``sample_frames`` from the generator's
    splitmix chain (frame f covers pixel indices f*w*h+1 .. (f+1)*w*h)."""
    from biomedical_el_ray.functions.sql_hash import splitmix_step_ctes

    salt = int(_VIDEO_SALT)
    t1, r1 = splitmix_step_ctes(
        "b0", ["doc_id"],
        [("s0", f"xor(CAST(doc_id AS HUGEINT), {salt}::HUGEINT)")], "g_",
    )
    t2, r2 = splitmix_step_ctes(
        "pix", ["doc_id", "f", "w", "h"],
        [("p", "xor(s0, CAST(f * w * h + i + 1 AS HUGEINT))")], "p_",
    )
    return f"""
        WITH b0 AS (SELECT doc_id FROM {docs_rel}),
        {t1},
        geo AS (
          SELECT doc_id, s0,
                 4 + ((s0 >> 16) & 7) AS nf,
                 4 + ((s0 >> 1) & 7) AS w,
                 4 + ((s0 >> 8) & 7) AS h
          FROM {r1}),
        fr AS (
          SELECT doc_id, s0, w, h,
                 unnest(generate_series(0, CAST(nf - 1 AS INTEGER), {stride})) AS f
          FROM geo),
        pix AS (
          SELECT doc_id, s0, f, w, h,
                 unnest(generate_series(0, CAST(w * h - 1 AS INTEGER))) AS i
          FROM fr),
        {t2},
        agg AS (
          SELECT doc_id, f, any_value(w) AS w, any_value(h) AS h,
                 CAST(sum(p & 255) AS DOUBLE) / count(*) AS mf
          FROM {r2} GROUP BY doc_id, f)
        SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
               CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
               mf AS mean_frame
        FROM agg
    """


_AMAGIC = b"FAUD"  # fake-audio container: magic | u32 n_samples | i16 samples
_AUDIO_SALT = np.uint64(0x4155_4449_4F00_0001)
_AUDIO_WIN = 256


def make_audio_payloads(sf_dir: str):
    """documents -> (doc_id, payload:binary) deterministic 16-bit PCM
    containers (512-1024 samples; a torchaudio/soundfile codec drops in
    behind the same sample-iterator seam)."""
    docs = read_table(sf_dir, "documents", ["doc_id"])

    def _gen(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s0s = splitmix64(ids.astype(np.uint64) ^ _AUDIO_SALT)
        payloads = []
        for s in s0s:
            n = 512 + int((s >> np.uint64(4)) & np.uint64(1)) * 512  # 512 or 1024
            i = np.arange(1, n + 1, dtype=np.uint64)
            samples = (
                (splitmix64(np.uint64(s) ^ i) & np.uint64(0xFFFF))
                .astype(np.int64) - 32768
            ).astype(np.int16)
            payloads.append(_AMAGIC + struct.pack("<I", n) + samples.tobytes())
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(payloads, pa.binary())],
            names=["doc_id", "payload"],
        )

    return docs.map_batches(_gen, batch_format="pyarrow", zero_copy_batch=True)


class AudioFeaturizer:
    """Actor-pool audio feature extraction: per fixed-size window, RMS
    energy and zero-crossing count (sign transitions between consecutive
    in-window samples; sample >= 0 counts as positive)."""

    def __init__(self, win: int = _AUDIO_WIN):
        self.win = win

    def __call__(self, t: pa.Table) -> pa.Table:
        win = self.win
        ids, wids, rms, zcr = [], [], [], []
        for doc_id, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            if p[:4] != _AMAGIC:
                raise NotImplementedError(f"no audio codec for prefix {p[:4]!r}")
            (n,) = struct.unpack_from("<I", p, 4)
            s = np.frombuffer(p, np.int16, count=n, offset=8).astype(np.int64)
            nw = n // win
            blocks = s[: nw * win].reshape(nw, win)
            e = np.sqrt((blocks.astype(np.float64) ** 2).sum(axis=1) / win)
            pos = blocks >= 0
            z = (pos[:, 1:] != pos[:, :-1]).sum(axis=1)
            ids.extend([doc_id] * nw)
            wids.extend(range(nw))
            rms.extend(e.tolist())
            zcr.extend(z.tolist())
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(wids, pa.int64()),
                pa.array(rms, pa.float64()),
                pa.array(zcr, pa.int64()),
            ],
            names=["doc_id", "win_idx", "rms", "n_zero_cross"],
        )


def audio_features(sf_dir: str, batch_size: int = 256, concurrency=(1, 4)):
    """(doc_id, win_idx, rms, n_zero_cross) per 256-sample window of each
    synthetic PCM payload.  DuckDB oracle: ``audio_features_oracle_sql``."""
    return make_audio_payloads(sf_dir).map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_features_oracle_sql(docs_rel: str = "documents") -> str:
    """DuckDB SQL reproducing ``audio_features``: samples from the
    generator's splitmix chain, RMS = sqrt(sum(s^2)/win) (integer sums
    are exact; sqrt is correctly rounded in both engines), crossings via
    lag() within each window."""
    from biomedical_el_ray.functions.sql_hash import splitmix_step_ctes

    salt = int(_AUDIO_SALT)
    win = _AUDIO_WIN
    t1, r1 = splitmix_step_ctes(
        "b0", ["doc_id"],
        [("s0", f"xor(CAST(doc_id AS HUGEINT), {salt}::HUGEINT)")], "g_",
    )
    t2, r2 = splitmix_step_ctes(
        "pix", ["doc_id", "i"],
        [("p", "xor(s0, CAST(i AS HUGEINT))")], "p_",
    )
    return f"""
        WITH b0 AS (SELECT doc_id FROM {docs_rel}),
        {t1},
        geo AS (
          SELECT doc_id, s0,
                 512 + CAST((s0 >> 4) & 1 AS INTEGER) * 512 AS n
          FROM {r1}),
        pix AS (
          SELECT doc_id, s0,
                 unnest(generate_series(1, n)) AS i
          FROM geo),
        {t2},
        smp AS (
          SELECT doc_id, i, CAST((p & 65535) - 32768 AS BIGINT) AS s,
                 (i - 1) // {win} AS win_idx
          FROM {r2}),
        lagged AS (
          SELECT doc_id, win_idx, s,
                 lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev,
                 (i - 1) % {win} AS j
          FROM smp),
        agg AS (
          SELECT doc_id, win_idx,
                 sqrt(CAST(sum(s * s) AS DOUBLE) / {win}) AS rms,
                 count(*) FILTER (
                   WHERE j > 0 AND (s >= 0) <> (prev >= 0)) AS zc
          FROM lagged GROUP BY doc_id, win_idx)
        SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx, rms,
               CAST(zc AS BIGINT) AS n_zero_cross
        FROM agg
    """


class MediaResizer(MediaDecoder):
    """Actor-pool decode + nearest-neighbor resize stage.

    Runs the REAL decode (PNG via zlib, FIMG raw) and then an integer
    nearest-neighbor downsample — src index ``(y * h) // out`` — so the
    result is bit-reproducible (and SQL-checkable for the synthetic
    payloads).  Header-only formats (JPEG) have no pixels to resize and
    are dropped with a count in mind: the output row set is exactly the
    decodable-payload set.
    """

    def __init__(self, out_size: int = 8):
        super().__init__()
        from biomedical_el_ray.functions.imagecodec import decode_png_pixels

        self._png_pixels = decode_png_pixels
        self.out = out_size

    def _pixels_of(self, payload: bytes):
        """payload -> (h, w) uint8 single-channel pixel grid or None."""
        from biomedical_el_ray.functions.imagecodec import PNG_SIG

        if payload[: len(PNG_SIG)] == PNG_SIG:
            arr = self._png_pixels(payload)
            return arr[:, :, 0]  # synthetic PNGs are grayscale
        if payload[: len(_MAGIC)] == _MAGIC:
            w, h = struct.unpack_from("<HH", payload, 4)
            return np.frombuffer(payload, np.uint8, offset=8).reshape(h, w)
        return None  # header-only formats (JPEG): nothing to resize

    def __call__(self, t: pa.Table) -> pa.Table:
        out = self.out
        ids, sw, sh, means = [], [], [], []
        oy = np.arange(out)
        for doc_id, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            px = self._pixels_of(p)
            if px is None:
                continue
            h, w = px.shape
            small = px[np.ix_((oy * h) // out, (oy * w) // out)]
            ids.append(doc_id)
            sh.append(h)
            sw.append(w)
            means.append(float(small.mean()))
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(sw, pa.int32()),
                pa.array(sh, pa.int32()),
                pa.array([out * out] * len(ids), pa.int64()),
                pa.array(means, pa.float64()),
            ],
            names=["doc_id", "src_w", "src_h", "n_resized", "mean_resized"],
        )


def resize_media(sf_dir: str, out_size: int = 8, batch_size: int = 256,
                 concurrency=(1, 4)):
    """(doc_id, src_w, src_h, n_resized, mean_resized) — decode + integer
    nearest-neighbor downsample of every decodable payload (JPEG shells
    carry no pixels and are excluded).  DuckDB oracle:
    ``resize_media_oracle_sql``."""
    return make_payloads(sf_dir).map_batches(
        MediaResizer,
        fn_constructor_kwargs={"out_size": out_size},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_media_oracle_sql(docs_rel: str = "documents",
                            out_size: int = 8) -> str:
    """DuckDB SQL reproducing ``resize_media``: nearest-neighbor source
    index ``(o * dim) // out`` per output cell, pixel values from the
    generator's splitmix chain, mean over the out x out grid."""
    from biomedical_el_ray.functions.sql_hash import splitmix_step_ctes

    salt = int(_MEDIA_SALT)
    t1, r1 = splitmix_step_ctes(
        "b0", ["doc_id"],
        [("s0", f"xor(CAST(doc_id AS HUGEINT), {salt}::HUGEINT)")], "g_",
    )
    t2, r2 = splitmix_step_ctes(
        "cells", ["doc_id", "w", "h"],
        [("p", "xor(s0, CAST(sy * w + sx + 1 AS HUGEINT))")], "p_",
    )
    return f"""
        WITH b0 AS (SELECT doc_id FROM {docs_rel}),
        {t1},
        geo AS (
          SELECT doc_id, s0,
                 8 + ((s0 >> 1) & 15) AS w,
                 8 + ((s0 >> 8) & 15) AS h
          FROM {r1}
          WHERE (s0 >> 62) <= 2),
        grid AS (SELECT unnest(generate_series(0, {out_size - 1})) AS o),
        cells AS (
          SELECT g.doc_id, g.s0, g.w, g.h,
                 (gy.o * g.h) // {out_size} AS sy,
                 (gx.o * g.w) // {out_size} AS sx
          FROM geo g CROSS JOIN grid gy CROSS JOIN grid gx),
        {t2},
        agg AS (
          SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
                 CAST(sum(p & 255) AS DOUBLE) / count(*) AS mr,
                 count(*) AS n
          FROM {r2} GROUP BY doc_id)
        SELECT doc_id,
               CAST(w AS INTEGER) AS src_w,
               CAST(h AS INTEGER) AS src_h,
               CAST(n AS BIGINT) AS n_resized,
               mr AS mean_resized
        FROM agg
    """


def decode_media_oracle_sql(docs_rel: str = "documents") -> str:
    """DuckDB SQL reproducing ``decode_media``'s expected output.

    Recomputes geometry (splitmix64 of the doc id, bit-sliced), format
    selection (top 2 hash bits) and the pixel mean (second splitmix chain
    over pixel indices; integer sums are exact in float64, so
    ``sum::DOUBLE / count`` equals ``np.mean`` bit-for-bit).  JPEG rows
    are header-only: zero samples, null mean.
    """
    from biomedical_el_ray.functions.sql_hash import splitmix_step_ctes

    salt = int(_MEDIA_SALT)
    t1, r1 = splitmix_step_ctes(
        "b0", ["doc_id"],
        [("s0", f"xor(CAST(doc_id AS HUGEINT), {salt}::HUGEINT)")], "g_",
    )
    t2, r2 = splitmix_step_ctes(
        "pixb", ["doc_id"], [("p", "xor(s0, CAST(i AS HUGEINT))")], "p_",
    )
    return f"""
        WITH b0 AS (SELECT doc_id FROM {docs_rel}),
        {t1},
        geo AS (
          SELECT doc_id, s0,
                 8 + ((s0 >> 1) & 15) AS w,
                 8 + ((s0 >> 8) & 15) AS h,
                 (s0 >> 62) AS fmt
          FROM {r1}),
        pixb AS (
          SELECT doc_id, s0,
                 unnest(generate_series(1, CAST(w * h AS INTEGER))) AS i
          FROM geo WHERE fmt <= 2),
        {t2},
        means AS (
          SELECT doc_id, CAST(sum(p & 255) AS DOUBLE) / count(*) AS mp
          FROM {r2} GROUP BY doc_id)
        SELECT g.doc_id,
               CASE WHEN fmt = 3 THEN 'jpeg'
                    WHEN fmt = 2 THEN 'png' ELSE 'fimg' END AS format,
               CAST(w AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               CAST(CASE WHEN fmt = 3 THEN 0 ELSE w * h END AS BIGINT) AS n_pixels,
               CASE WHEN fmt = 3 THEN NULL ELSE m.mp END AS mean_pixel
        FROM geo g LEFT JOIN means m ON g.doc_id = m.doc_id
    """


class DHasher:
    """Actor-pool perceptual-hash stage: REAL pixel decode (PNG via the
    stdlib zlib codec, FIMG via frombuffer), nearest-neighbor resample to
    a 9x8 grid, horizontal-gradient dHash (Krawetz's difference hash)."""

    def __init__(self, grid_w: int = 9, grid_h: int = 8):
        from biomedical_el_ray.functions.imagecodec import (
            PNG_SIG, decode_png_pixels,
        )

        self.grid_w, self.grid_h = grid_w, grid_h
        self._png_sig = PNG_SIG
        self._decode_png_pixels = decode_png_pixels

    def _pixels(self, payload: bytes):
        if payload[: len(self._png_sig)] == self._png_sig:
            arr = self._decode_png_pixels(payload)
            return arr.reshape(arr.shape[0], -1)  # grayscale: ch==1
        if payload[:4] == _MAGIC:
            w, h = struct.unpack_from("<HH", payload, 4)
            return np.frombuffer(
                payload, dtype=np.uint8, offset=8).reshape(h, w)
        return None  # header-only formats (JPEG shell): no pixels

    def __call__(self, t: pa.Table) -> pa.Table:
        gw, gh = self.grid_w, self.grid_h
        ids, hashes = [], []
        for doc_id, p in zip(t["doc_id"].to_pylist(),
                             t["payload"].to_pylist()):
            px = self._pixels(p)
            if px is None:
                continue
            h, w = px.shape
            sy = (np.arange(gh, dtype=np.int64) * h) // gh
            sx = (np.arange(gw, dtype=np.int64) * w) // gw
            g = px[np.ix_(sy, sx)].astype(np.int64)
            bits = (g[:, :-1] > g[:, 1:]).astype(np.uint64).ravel()
            dh = int((bits << np.arange(bits.size, dtype=np.uint64)).sum(
                dtype=np.uint64))
            ids.append(doc_id)
            hashes.append(f"{dh:016x}")
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(hashes, pa.string())],
            names=["doc_id", "dhash"],
        )


def media_dhash(sf_dir: str, batch_size: int = 256, concurrency=(1, 4)):
    """(doc_id, dhash) — the 64-bit difference hash of every decodable
    media payload: nearest-neighbor resample to 9x8 (the same
    ``(o*dim)//out`` rule as ``resize_media``), one bit per horizontal
    gradient sign, rendered as 16 lowercase hex digits.  dHash is the
    standard cheap perceptual near-dup fingerprint for image corpora
    (crops/re-encodes keep most gradient signs, so near-dups sit within
    a small Hamming distance — pair them with ``simhash_dedup``'s banded
    machinery at scale).  The Ray side exercises the REAL PNG decode
    path (zlib + scanline unfiltering); the oracle reproduces the same
    pixels arithmetically from the generator's splitmix chain, so a
    codec regression breaks the match.  Header-only payloads (JPEG
    shells) have no pixels and are skipped on both sides, like
    ``resize_media``.
    """
    return make_payloads(sf_dir).map_batches(
        DHasher,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_dhash_oracle_sql(docs_rel: str = "documents",
                           grid_w: int = 9, grid_h: int = 8) -> str:
    """DuckDB twin of ``media_dhash``: splitmix pixels at the 9x8
    nearest-neighbor sample points, horizontal compare, HUGEINT bit
    fold, printf hex render."""
    from biomedical_el_ray.functions.sql_hash import splitmix_step_ctes

    salt = int(_MEDIA_SALT)
    t1, r1 = splitmix_step_ctes(
        "b0", ["doc_id"],
        [("s0", f"xor(CAST(doc_id AS HUGEINT), {salt}::HUGEINT)")], "g_",
    )
    t2, r2 = splitmix_step_ctes(
        "cells", ["doc_id", "gy", "gx"],
        [("p", "xor(s0, CAST(sy * w + sx + 1 AS HUGEINT))")], "p_",
    )
    return f"""
        WITH b0 AS (SELECT doc_id FROM {docs_rel}),
        {t1},
        geo AS (
          SELECT doc_id, s0,
                 8 + ((s0 >> 1) & 15) AS w,
                 8 + ((s0 >> 8) & 15) AS h
          FROM {r1}
          WHERE (s0 >> 62) <= 2),
        gys AS (SELECT unnest(generate_series(0, {grid_h - 1})) AS gy),
        gxs AS (SELECT unnest(generate_series(0, {grid_w - 1})) AS gx),
        cells AS (
          SELECT g.doc_id, g.s0, g.w, gy.gy, gx.gx,
                 (gy.gy * g.h) // {grid_h} AS sy,
                 (gx.gx * g.w) // {grid_w} AS sx
          FROM geo g CROSS JOIN gys gy CROSS JOIN gxs gx),
        {t2},
        px AS (SELECT doc_id, gy, gx, p & 255 AS v FROM {r2}),
        bits AS (
          SELECT a.doc_id,
                 CAST(a.gy * {grid_w - 1} + a.gx AS INTEGER) AS k,
                 (a.v > b.v) AS bit
          FROM px a JOIN px b
            ON a.doc_id = b.doc_id AND a.gy = b.gy AND b.gx = a.gx + 1
          WHERE a.gx < {grid_w - 1}),
        folded AS (
          SELECT doc_id,
                 sum(CASE WHEN bit THEN (1::HUGEINT << k)
                     ELSE 0::HUGEINT END) AS dh
          FROM bits GROUP BY doc_id)
        SELECT doc_id,
               printf('%08x%08x',
                      CAST(dh >> 32 AS BIGINT),
                      CAST(dh & 4294967295 AS BIGINT)) AS dhash
        FROM folded
    """


# ---------------------------------------------------------------------------
# scene-cut detection over the video frame seam
# ---------------------------------------------------------------------------

_SCENE_CUT_THR_PM = 330  # per-mille mean-abs-diff threshold


class SceneCutDetector:
    """Actor-pool scene-cut stage: decode the container once, compute the
    sum of absolute pixel differences (SAD) between every consecutive
    frame pair, emit one row per transition with an integer per-mille
    difference and the cut flag.  The standard shot-boundary primitive
    (frame-diff thresholding) behind the same frame-iterator seam as
    ``FrameSampler`` — an ffmpeg/PyAV decoder drops in without touching
    the Ray plumbing."""

    def __init__(self, thr_pm: int = _SCENE_CUT_THR_PM):
        self.thr_pm = thr_pm

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, sads, fps = [], [], [], []
        for doc_id, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            if p[:4] != _VMAGIC:
                raise NotImplementedError(
                    f"no video codec for prefix {p[:4]!r}"
                )
            nf, w, h = struct.unpack_from("<HHH", p, 4)
            if nf < 2:
                continue
            frames = np.frombuffer(p, np.uint8, offset=10).reshape(nf, h * w)
            sad = np.abs(
                frames[1:].astype(np.int64) - frames[:-1].astype(np.int64)
            ).sum(axis=1)
            ids.extend([doc_id] * (nf - 1))
            fidx.extend(range(1, nf))
            sads.extend(sad.tolist())
            fps.extend((sad * 1000 // (w * h * 255)).tolist())
        fp = np.asarray(fps, np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(fidx, pa.int64()),
                pa.array(sads, pa.int64()),
                pa.array(fp),
                pa.array(fp >= self.thr_pm),
            ],
            names=["doc_id", "frame_idx", "sad", "diff_pm", "is_cut"],
        )


def scene_cuts(sf_dir: str, thr_pm: int = _SCENE_CUT_THR_PM,
               batch_size: int = 256, concurrency=(1, 4)):
    """(doc_id, frame_idx, sad, diff_pm, is_cut) — shot-boundary
    detection over every consecutive frame pair of each video payload:
    ``frame_idx`` is the LATER frame of the transition, ``sad`` the exact
    integer sum of absolute pixel differences, ``diff_pm`` the per-mille
    mean difference (``sad * 1000 // (n_pixels * 255)``), ``is_cut`` the
    threshold flag.  Integer algebra end-to-end, so the splitmix
    pixel-chain DuckDB twin is bit-exact; single-frame videos emit no
    transitions."""
    return make_video_payloads(sf_dir).map_batches(
        SceneCutDetector,
        fn_constructor_kwargs={"thr_pm": thr_pm},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def scene_cuts_oracle_sql(docs_rel: str = "documents",
                          thr_pm: int = _SCENE_CUT_THR_PM) -> str:
    """DuckDB twin: the sample_frames splitmix pixel chain at stride 1,
    self-joined on (doc_id, pixel) for adjacent frames, integer SAD."""
    from biomedical_el_ray.functions.sql_hash import splitmix_step_ctes

    salt = int(_VIDEO_SALT)
    t1, r1 = splitmix_step_ctes(
        "b0", ["doc_id"],
        [("s0", f"xor(CAST(doc_id AS HUGEINT), {salt}::HUGEINT)")], "sc_",
    )
    t2, r2 = splitmix_step_ctes(
        "pix", ["doc_id", "f", "w", "h", "i"],
        [("p", "xor(s0, CAST(f * w * h + i + 1 AS HUGEINT))")], "sp_",
    )
    return f"""
        WITH b0 AS (SELECT doc_id FROM {docs_rel}),
        {t1},
        geo AS (
          SELECT doc_id, s0,
                 4 + ((s0 >> 16) & 7) AS nf,
                 4 + ((s0 >> 1) & 7) AS w,
                 4 + ((s0 >> 8) & 7) AS h
          FROM {r1}),
        fr AS (
          SELECT doc_id, s0, w, h,
                 unnest(generate_series(0, CAST(nf - 1 AS INTEGER))) AS f
          FROM geo),
        pix AS (
          SELECT doc_id, s0, f, w, h,
                 unnest(generate_series(0, CAST(w * h - 1 AS INTEGER))) AS i
          FROM fr),
        {t2},
        px AS MATERIALIZED (
          SELECT doc_id, f, w, h, i, CAST(p & 255 AS BIGINT) AS v
          FROM {r2}),
        sad AS (
          SELECT a.doc_id, b.f AS frame_idx, any_value(a.w) AS w,
                 any_value(a.h) AS h, sum(abs(a.v - b.v)) AS sad
          FROM px a
          JOIN px b ON b.doc_id = a.doc_id AND b.i = a.i AND b.f = a.f + 1
          GROUP BY 1, 2)
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(sad AS BIGINT) AS sad,
               CAST(sad * 1000 // (w * h * 255) AS BIGINT) AS diff_pm,
               (sad * 1000 // (w * h * 255)) >= {thr_pm} AS is_cut
        FROM sad
    """


# ---------------------------------------------------------------------------
# voice-activity detection over the audio window seam
# ---------------------------------------------------------------------------

# per-256-sample-window energy threshold (sum of squared samples):
# uniform int16 noise averages ~9.16e10 per window, so this sits at the
# distribution's center and real runs alternate
_VAD_ES_THR = 91_650_000_000


class VadSegmenter:
    """Actor-pool voice-activity stage: decode the PCM container once,
    mark each fixed-size window voiced iff its EXACT integer energy
    (sum of squared samples) reaches the threshold, and emit maximal
    voiced runs as segments — the standard energy-gate VAD shape; a
    model VAD (silero/webrtc) drops in behind the same window seam."""

    def __init__(self, win: int = _AUDIO_WIN, es_thr: int = _VAD_ES_THR):
        self.win = win
        self.es_thr = es_thr

    def __call__(self, t: pa.Table) -> pa.Table:
        win = self.win
        ids, segs, starts, ends, lens = [], [], [], [], []
        for doc_id, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            if p[:4] != _AMAGIC:
                raise NotImplementedError(f"no audio codec for prefix {p[:4]!r}")
            (n,) = struct.unpack_from("<I", p, 4)
            s = np.frombuffer(p, np.int16, count=n, offset=8).astype(np.int64)
            nw = n // win
            es = (s[: nw * win].reshape(nw, win) ** 2).sum(axis=1)
            voiced = es >= self.es_thr
            if not voiced.any():
                continue
            # maximal runs of voiced windows
            d = np.diff(voiced.astype(np.int8))
            run_starts = np.flatnonzero(np.concatenate(
                ([voiced[0]], d == 1)))
            run_ends = np.flatnonzero(np.concatenate(
                (d == -1, [voiced[-1]])))
            k = len(run_starts)
            ids.extend([doc_id] * k)
            segs.extend(range(k))
            starts.extend(run_starts.tolist())
            ends.extend(run_ends.tolist())
            lens.extend((run_ends - run_starts + 1).tolist())
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(segs, pa.int64()),
                pa.array(starts, pa.int64()),
                pa.array(ends, pa.int64()),
                pa.array(lens, pa.int64()),
            ],
            names=["doc_id", "seg_idx", "start_win", "end_win", "n_windows"],
        )


def audio_vad(sf_dir: str, es_thr: int = _VAD_ES_THR,
              batch_size: int = 256, concurrency=(1, 4)):
    """(doc_id, seg_idx, start_win, end_win, n_windows) — energy-gate
    voice-activity segments per PCM payload: maximal runs of 256-sample
    windows whose exact integer energy reaches ``es_thr``.  Integer
    algebra keeps the splitmix sample-chain DuckDB twin (gaps-and-islands
    over the voiced windows) bit-exact; all-silent payloads emit no
    rows."""
    return make_audio_payloads(sf_dir).map_batches(
        VadSegmenter,
        fn_constructor_kwargs={"es_thr": es_thr},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_vad_oracle_sql(docs_rel: str = "documents",
                         es_thr: int = _VAD_ES_THR) -> str:
    """DuckDB twin: the audio splitmix sample chain, per-window integer
    energies, voiced gate, and the row_number gaps-and-islands grouping."""
    from biomedical_el_ray.functions.sql_hash import splitmix_step_ctes

    salt = int(_AUDIO_SALT)
    win = _AUDIO_WIN
    t1, r1 = splitmix_step_ctes(
        "b0", ["doc_id"],
        [("s0", f"xor(CAST(doc_id AS HUGEINT), {salt}::HUGEINT)")], "v_",
    )
    t2, r2 = splitmix_step_ctes(
        "pix", ["doc_id", "i"],
        [("p", "xor(s0, CAST(i AS HUGEINT))")], "w_",
    )
    return f"""
        WITH b0 AS (SELECT doc_id FROM {docs_rel}),
        {t1},
        geo AS (
          SELECT doc_id, s0,
                 512 + CAST((s0 >> 4) & 1 AS INTEGER) * 512 AS n
          FROM {r1}),
        pix AS (
          SELECT doc_id, s0, unnest(generate_series(1, n)) AS i
          FROM geo),
        {t2},
        smp AS (
          SELECT doc_id, (i - 1) // {win} AS win_idx,
                 CAST((p & 65535) - 32768 AS BIGINT) AS s
          FROM {r2}),
        en AS (
          SELECT doc_id, win_idx, sum(s * s) AS es
          FROM smp GROUP BY 1, 2),
        voiced AS (
          SELECT doc_id, win_idx,
                 win_idx - row_number() OVER (
                   PARTITION BY doc_id ORDER BY win_idx) AS island
          FROM en WHERE es >= {es_thr}),
        seg AS (
          SELECT doc_id, min(win_idx) AS start_win, max(win_idx) AS end_win,
                 count(*) AS n_windows
          FROM voiced GROUP BY doc_id, island)
        SELECT doc_id,
               CAST(row_number() OVER (
                 PARTITION BY doc_id ORDER BY start_win) - 1 AS BIGINT)
                 AS seg_idx,
               CAST(start_win AS BIGINT) AS start_win,
               CAST(end_win AS BIGINT) AS end_win,
               CAST(n_windows AS BIGINT) AS n_windows
        FROM seg
    """
