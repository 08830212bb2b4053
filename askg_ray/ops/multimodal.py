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

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires PIL/torchaudio (not in container); "
                "run with fake=True for the deterministic stand-in")
        h = hashlib.sha256(payload).digest()
        return (np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32)
                / 255.0)

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
            "width": pa.array([64] * len(ids), pa.int32()),
            "height": pa.array([64] * len(ids), pa.int32()),
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
