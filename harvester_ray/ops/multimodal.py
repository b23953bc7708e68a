"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference runs Tika text extraction and thumbnail generation as stateful
external-process stages over file payloads (harvester/files/tasks/
metadata.py:71-134, harvester/files/tasks/previews.py:8-102). Here the same
shape — binary column in, feature/derivative columns out, actor pool holding
the decoder — with the decode itself STUBBED (no image/audio libs in this
container): ``DecodeStage`` tries to import PIL and, absent it, uses a
deterministic fake decoder so the Ray-side plumbing (schema, batch sizing,
actor signatures, output layout) is real and tested.

Scale notes: binary payloads make rows wide — callers should use a small
``batch_size`` and let blocks hold few rows; payloads stay zero-copy Arrow
buffers end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

# MIME → technical type lookup, mirroring the reference's broadcast-dict
# pattern (harvester/files/models/datatypes/file.py:158-173)
MIME_TO_TYPE = {
    "image/png": "image",
    "image/jpeg": "image",
    "audio/wav": "audio",
    "audio/mpeg": "audio",
    "video/mp4": "video",
    "application/pdf": "document",
}


def synth_media(n_items: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (binary payloads with typed metadata)."""
    rng = np.random.default_rng(seed)
    mimes = np.array(list(MIME_TO_TYPE.keys()))
    chosen = mimes[rng.integers(0, len(mimes), size=n_items)]
    sizes = rng.integers(256, 4096, size=n_items)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    return pa.table(
        {
            "item_id": pa.array(np.arange(n_items, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(chosen.tolist(), pa.string()),
            "width": pa.array(rng.integers(16, 512, size=n_items).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, size=n_items).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeStage:
    """Actor-pool decode / feature-extract stage.

    ``__init__`` (once per actor) probes the decoder libraries; ``__call__``
    (per batch) decodes payloads into a fixed-size feature vector + derived
    metadata. Without PIL/librosa the decode is a deterministic fake
    (sha256-seeded feature vector) — clearly marked, same schema.
    """

    FEATURE_DIM = 16

    def __init__(self, target_size: tuple[int, int] = (32, 32)):
        self.target_size = target_size
        try:  # pragma: no cover - library not present in this container
            from PIL import Image  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False

    def _fake_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(digest[: self.FEATURE_DIM * 2], dtype=np.uint16)
        return (raw / 65535.0).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._real:  # pragma: no cover
            raise NotImplementedError(
                "real image decode requires PIL; this container ships none — "
                "plug the actual decoder here"
            )
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._fake_features(p) for p in payloads])
        types = [MIME_TO_TYPE.get(m, "unknown") for m in batch["mime"].to_pylist()]
        sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
        return pa.table(
            {
                "item_id": batch["item_id"],
                "technical_type": pa.array(types, pa.string()),
                "payload_bytes": pa.array(sizes, pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32(), self.FEATURE_DIM)
                ),
            }
        )


def decode_features(ds, *, concurrency: int = 2, batch_size: int = 16):
    """Run the decode stage as an actor pool with small batches (wide rows)."""
    return ds.map_batches(
        DecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def frame_sample(
    ds,
    every_n: int = 4,
    frame_stride: int = 1024,
    *,
    id_col: str = "item_id",
):
    """Expand each video row into its sampled frame rows — the real fan-out
    plumbing of video frame sampling (one input row → many frame rows), with
    the frame *decode* faked deterministically (no codec libs in this
    container): "frame" j of an item is the payload byte-slice
    ``[j*frame_stride, (j+1)*frame_stride)``, and every ``every_n``-th frame
    is kept. Output (item_id, frame_idx, frame_payload, frame_bytes), one
    row per sampled frame, batch-vectorized offsets (the per-frame slice is
    the only per-object step — binary payloads are inherently per-object).

    Scale note: output rows ≈ input_bytes / (frame_stride * every_n); keep
    ``batch_size`` small upstream for wide payloads so a batch × pool fits
    worker heaps (the same sizing rule as DecodeStage)."""
    import pyarrow.compute as pc

    def expand(batch: pa.Table) -> pa.Table:
        vid = batch.filter(pc.equal(batch["mime"], "video/mp4"))
        if vid.num_rows == 0:
            return pa.table(
                {
                    "item_id": pa.array([], pa.int64()),
                    "frame_idx": pa.array([], pa.int32()),
                    "frame_payload": pa.array([], pa.binary()),
                    "frame_bytes": pa.array([], pa.int64()),
                }
            )
        payloads = vid["payload"].to_pylist()
        ids = np.asarray(vid[id_col].combine_chunks().cast(pa.int64()))
        sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
        n_frames = -(-sizes // frame_stride)  # ceil
        n_sampled = -(-n_frames // every_n)
        # vectorized (row, frame_idx) expansion: repeat row ids, then build
        # each row's sampled frame indices 0, every_n, 2*every_n, ...
        row_of = np.repeat(np.arange(len(payloads)), n_sampled)
        starts = np.zeros(len(payloads), dtype=np.int64)
        np.cumsum(n_sampled[:-1], out=starts[1:])
        within = np.arange(row_of.size, dtype=np.int64) - starts[row_of]
        fidx = within * every_n
        frames = [
            payloads[r][f * frame_stride : (f + 1) * frame_stride]
            for r, f in zip(row_of, fidx)
        ]
        return pa.table(
            {
                "item_id": pa.array(ids[row_of], pa.int64()),
                "frame_idx": pa.array(fidx.astype(np.int32), pa.int32()),
                "frame_payload": pa.array(frames, pa.binary()),
                "frame_bytes": pa.array(
                    np.fromiter((len(f) for f in frames), dtype=np.int64, count=len(frames)),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
