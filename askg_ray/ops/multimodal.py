"""Multimodal column plumbing — decode stages STUBBED, Ray plumbing real.

Treats image/audio payloads as opaque ``binary`` columns with typed
metadata. The decode kernels (PIL / torchaudio / ffmpeg) are not in
this container, so ``decode_image`` raises NotImplementedError unless
``fake=True`` substitutes a deterministic fake decoder — but the
Ray-side shape is real and tested: actor-pool ``map_batches`` with
small ``batch_size`` (large payloads × concurrency must fit worker
heaps), zero-copy binary in, fixed-schema feature rows out.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # "image" | "audio"
    ("payload", pa.binary()),        # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),           # metadata carried alongside, -1 unknown
    ("height", pa.int32()),
])

FEATURE_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("n_bytes", pa.int64()),
    ("fp16", pa.string()),                   # sha256 hex prefix — SQL-checkable
    ("feature", pa.list_(pa.float32(), 8)),  # fixed-size feature vector
])


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(128 + int(i) * 7) for i in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["image" if i % 2 == 0 else "audio" for i in range(n)]),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/png" if i % 2 == 0 else "audio/wav"
                          for i in range(n)]),
        "width": pa.array([64] * n, pa.int32()),
        "height": pa.array([64] * n, pa.int32()),
    }, schema=MEDIA_SCHEMA)


class MediaFeaturizer:
    """Actor-pool decode/feature stage.

    Real deployments load the decoder once per actor here (__init__);
    in this container the decode step is stubbed: fake=False raises
    NotImplementedError at first batch, fake=True derives a
    deterministic 8-dim feature from the payload hash.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake
        self._pil = None
        if not fake:
            # decoder import happens ONCE per actor, here — where a
            # real deployment loads its model/codec. The container has
            # no PIL, so fake=False raises at actor build (loudly, not
            # mid-stream); where PIL exists the image path is real and
            # the audio path decodes raw int16 PCM with numpy.
            try:
                from PIL import Image
                self._pil = Image
            except ImportError as e:
                raise NotImplementedError(
                    "media decode requires PIL (not in container); "
                    "run with fake=True for the deterministic "
                    "stand-in") from e

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            return self._decode_real(payload, kind)
        h = hashlib.sha256(payload).digest()
        return (np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32)
                / 255.0)

    def _decode_real(self, payload: bytes, kind: str) -> np.ndarray:
        if kind == "image":
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("L") \
                .resize((8, 1))
            px = np.frombuffer(img.tobytes(), dtype=np.uint8)[:8]
            return px.astype(np.float32) / 255.0
        # audio: raw int16 PCM → 8-band RMS energies (numpy only)
        n = len(payload) - (len(payload) % 2)
        pcm = np.frombuffer(payload[:n], dtype=np.int16).astype(np.float32)
        if pcm.size == 0:
            return np.zeros(8, dtype=np.float32)
        pad = (-pcm.size) % 8
        pcm = np.pad(pcm, (0, pad))
        bands = pcm.reshape(8, -1)
        return np.sqrt((bands * bands).mean(axis=1)) / 32768.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, nbytes, fps = [], [], []
        for payload, kind in zip(batch["payload"].to_pylist(),
                                 batch["kind"].to_pylist()):
            feats.append(self._decode(payload, kind).tolist())
            nbytes.append(len(payload))
            fps.append(hashlib.sha256(payload).hexdigest()[:16])
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "n_bytes": pa.array(nbytes, pa.int64()),
            "fp16": pa.array(fps, pa.string()),
            "feature": pa.array(feats, pa.list_(pa.float32(), 8)),
        }, schema=FEATURE_SCHEMA)


def featurize_media(media_ds, concurrency: int = 2, batch_size: int = 16):
    """The real Ray plumbing: actor pool, small batches for fat rows."""
    return media_ds.map_batches(MediaFeaturizer, batch_format="pyarrow",
                                concurrency=concurrency, batch_size=batch_size)


def media_from_documents(sf_dir: str):
    """Media corpus derived from the documents table — payload = the
    document's UTF-8 bytes (an opaque blob as far as this stage is
    concerned), media_id = doc_id, kind alternating by parity. Being
    table-derived makes the decode output DuckDB-checkable (sha256 /
    octet_length reproduce the deterministic fake decoder)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["image" if i % 2 == 0 else "audio"
                              for i in ids]),
            "payload": pa.array([(t or "").encode() for t in texts],
                                pa.binary()),
            "mime": pa.array(["image/png" if i % 2 == 0 else "audio/wav"
                              for i in ids]),
            # doc-dependent dims so the resize arithmetic is non-trivial
            "width": pa.array([32 + i % 97 for i in ids], pa.int32()),
            "height": pa.array([32 + i % 53 for i in ids], pa.int32()),
        }, schema=MEDIA_SCHEMA)

    return docs.map_batches(to_media, batch_format="pyarrow")


def media_features(sf_dir: str):
    """queries() entry: documents-derived media corpus → decoded
    features; the SQL-checkable projection (floats dropped — the DuckDB
    hash compare is exact-value, and fp16 covers the same decode)."""
    feats = featurize_media(media_from_documents(sf_dir))
    return feats.map_batches(
        lambda t: t.select(["media_id", "kind", "n_bytes", "fp16"]),
        batch_format="pyarrow")


# ---- resize + frame sampling ------------------------------------------------

RESIZE_BOX = 32        # fit-into box edge for the resize stage
FRAME_BYTES = 256      # fake video: fixed-size byte frames
FRAME_STRIDE = 4       # sample every 4th frame


class MediaResizer:
    """Actor-pool resize stage: the real kernel (PIL.Image.resize /
    ffmpeg scale) loads once per actor in __init__ and is STUBBED here
    like the decoder; the aspect-preserving target-dimension arithmetic
    and the Ray plumbing are real. fake=True emits the deterministic
    stand-in (sha of payload + target dims)."""

    def __init__(self, fake: bool = True, box: int = RESIZE_BOX):
        self.fake = fake
        self.box = box
        self._pil = None
        if not fake:
            try:
                from PIL import Image     # once per actor (see featurizer)
                self._pil = Image
            except ImportError as e:
                raise NotImplementedError(
                    "resize requires PIL (not in container); run with "
                    "fake=True for the deterministic stand-in") from e

    def _resize_fp(self, payload: bytes, ow: int, oh: int) -> str:
        """Real kernel where PIL exists: decode, aspect-fit resize,
        fingerprint the resized raw bytes."""
        import io

        img = self._pil.open(io.BytesIO(payload)).convert("L") \
            .resize((ow, oh))
        return hashlib.sha256(img.tobytes()).hexdigest()[:16]

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.maximum(w, h)
        ow = np.maximum(1, w * self.box // m)
        oh = np.maximum(1, h * self.box // m)
        if self.fake:
            fps = [hashlib.sha256(p + f"|{a}x{b}".encode()).hexdigest()[:16]
                   for p, a, b in zip(batch["payload"].to_pylist(),
                                      ow.tolist(), oh.tolist())]
        else:
            fps = [self._resize_fp(p, int(a), int(b))
                   for p, a, b in zip(batch["payload"].to_pylist(),
                                      ow.tolist(), oh.tolist())]
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "out_w": pa.array(ow, pa.int64()),
            "out_h": pa.array(oh, pa.int64()),
            "resized_fp16": pa.array(fps, pa.string()),
        })


def media_resize(sf_dir: str):
    """queries() entry: aspect-preserving resize into a 32-box over the
    documents-derived media corpus (actor pool, small batches)."""
    return media_from_documents(sf_dir).map_batches(
        MediaResizer, batch_format="pyarrow", concurrency=2, batch_size=16)


RESIZE_ORACLE_SQL = f"""
WITH m AS (SELECT doc_id AS media_id,
                  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
                      AS kind,
                  32 + doc_id % 97 AS w, 32 + doc_id % 53 AS h, text
           FROM documents),
d AS (SELECT media_id, kind, text,
             greatest(1, w * {RESIZE_BOX} // greatest(w, h)) AS out_w,
             greatest(1, h * {RESIZE_BOX} // greatest(w, h)) AS out_h
      FROM m)
SELECT media_id, kind, out_w, out_h,
       substr(sha256(text || '|' || out_w || 'x' || out_h), 1, 16)
           AS resized_fp16
FROM d
""".strip()


def frame_sample_batch(batch: pa.Table) -> pa.Table:
    """Fake video frame sampling: treat the payload as a stream of
    FRAME_BYTES-byte frames, keep every FRAME_STRIDE-th (plumbing shape
    of ffmpeg -vf select + explode: one output row per sampled frame).
    Stateless flat map — at 100 TB the explode inherits the input
    partitioning and no frame bytes enter any shuffle (fingerprints
    only)."""
    out_id, out_idx, out_fp = [], [], []
    for mid, payload in zip(batch["media_id"].to_pylist(),
                            batch["payload"].to_pylist()):
        p = payload or b""
        nf = max(1, -(-len(p) // FRAME_BYTES))
        for i in range(0, nf, FRAME_STRIDE):
            frame = p[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]
            out_id.append(mid)
            out_idx.append(i)
            out_fp.append(hashlib.sha256(frame).hexdigest()[:16])
    return pa.table({
        "media_id": pa.array(out_id, pa.int64()),
        "frame_idx": pa.array(out_idx, pa.int64()),
        "frame_fp16": pa.array(out_fp, pa.string()),
    })


def media_frames(sf_dir: str):
    """queries() entry: sampled-frame fingerprints per media payload."""
    return media_from_documents(sf_dir).map_batches(
        frame_sample_batch, batch_format="pyarrow", batch_size=16)


FRAMES_ORACLE_SQL = f"""
WITH m AS (SELECT doc_id AS media_id, text,
                  greatest(1, (length(text) + {FRAME_BYTES - 1})
                              // {FRAME_BYTES}) AS nf
           FROM documents),
f AS (SELECT media_id, unnest([{{'frame_idx': i,
       'frame_fp16': substr(sha256(substr(text, i * {FRAME_BYTES} + 1,
                                          {FRAME_BYTES})), 1, 16)}}
       FOR i IN range(0, nf, {FRAME_STRIDE})], recursive := true)
      FROM m)
SELECT media_id, frame_idx, frame_fp16 FROM f
""".strip()


# ---- exact payload dedup over the media pipeline ----------------------------


def media_dedup(sf_dir: str):
    """Exact duplicate groups over OPAQUE media payloads: the binary
    blobs stream through the same actor-pool featurizer (fingerprints
    computed once per payload, small batches — the multimodal batch
    discipline), then one groupby over the 64-bit fingerprint yields
    (fp16, n_copies, canonical_id = min media_id, n_bytes) for every
    group with more than one copy — content-addressed dedup for an
    image/audio lake, where payload bytes never cross the exchange
    (only 16-hex-char fingerprints and int64s do)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    media = media_from_documents(sf_dir)
    # deterministic re-upload stream (the at-least-once ingest every
    # media lake sees): every media_id % 10 == 7 arrives again under a
    # new id with byte-identical payload — mirrored in the oracle
    def replicas(t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((ids % 10) == 7))
        return t.set_column(
            t.schema.get_field_index("media_id"), "media_id",
            pa.array(t["media_id"].to_numpy(zero_copy_only=False)
                     + 500_000, pa.int64()))

    both = media.union(media.map_batches(replicas,
                                         batch_format="pyarrow"))
    feats = featurize_media(both)
    thin = feats.map_batches(
        lambda t: t.select(["media_id", "fp16", "n_bytes"]),
        batch_format="pyarrow")
    g = (thin.groupby("fp16")
         .aggregate(Count(alias_name="n_copies"),
                    Min("media_id", alias_name="canonical_id"),
                    Max("n_bytes", alias_name="n_bytes")))
    return g.filter(expr="n_copies > 1")


MEDIA_DEDUP_ORACLE_SQL = """
WITH m AS (
  SELECT doc_id AS media_id,
         substr(sha256(coalesce(text, '')), 1, 16) AS fp16,
         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes
  FROM documents
  UNION ALL
  SELECT doc_id + 500000,
         substr(sha256(coalesce(text, '')), 1, 16),
         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
  FROM documents WHERE doc_id % 10 = 7)
SELECT fp16, CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(media_id) AS BIGINT) AS canonical_id,
       CAST(max(n_bytes) AS BIGINT) AS n_bytes
FROM m GROUP BY fp16 HAVING count(*) > 1
""".strip()
