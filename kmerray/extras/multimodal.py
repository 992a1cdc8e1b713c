"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode stage probes for a real codec (PIL) at actor init and
uses it when present; otherwise it falls back to a deterministic fake
decoder so the Ray-side plumbing — schema, small batch sizes for
large payloads, actor ``__init__`` setup, output layout — is real and
tested everywhere (``fake=None`` auto-detects; ``fake=False`` demands
the real codec and raises NotImplementedError where the libraries are
absent, the clearly-marked codec boundary).  Byte-level feature
extraction (histogram, entropy) is real in both paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.string()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),     # "image" | "audio" | "video"
    ("width", pa.int32()),           # metadata as ingested (untrusted)
    ("height", pa.int32()),
])


def synth_media_table(n_items: int, seed: int = 42,
                      payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media corpus (binary blobs + metadata)."""
    rng = np.random.default_rng([seed, n_items])
    payloads = [rng.integers(0, 256, size=rng.integers(
        payload_bytes // 2, payload_bytes), dtype=np.uint8).tobytes()
        for _ in range(n_items)]
    kinds = rng.choice(["image", "audio", "video"], size=n_items)
    return pa.table({
        "item_id": pa.array([f"item-{i:06d}" for i in range(n_items)]),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(kinds),
        "width": pa.array(rng.integers(16, 256, n_items, dtype=np.int32)),
        "height": pa.array(rng.integers(16, 256, n_items, dtype=np.int32)),
    })


def ensure_media_parquet(n_items: int = 500, seed: int = 42) -> str:
    """Write-once deterministic media parquet under the shared cache
    root, so the Ray pipeline and the DuckDB oracle read the SAME
    bytes (the pattern of ``sources.synth.ensure_sequences``)."""
    import json
    import os

    import pyarrow.parquet as pq

    from ..sources.synth import CACHE_ROOT
    out_dir = os.path.join(CACHE_ROOT, f"media-n{n_items}-s{seed}-v1")
    path = os.path.join(out_dir, "media.parquet")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return path
    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(synth_media_table(n_items, seed=seed),
                   os.path.join(tmp_dir, "media.parquet"),
                   row_group_size=128)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as fh:
        json.dump({"n_items": n_items, "seed": seed}, fh)
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        if not os.path.exists(marker):
            raise
        import shutil
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return path


def _try_import_pil():
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


class DecodeStage:
    """Actor-pool stage: codec probed/initialised once per actor.

    Real pipeline shape: small ``batch_size`` (large payloads),
    ``concurrency`` x ``num_cpus`` sized to the node, decode ->
    fixed-size feature vector (here: grayscale histogram + entropy +
    mean; with PIL present the decode is a real image decode +
    resize, otherwise the deterministic fake).
    """

    def __init__(self, fake: bool | None = None, resize_to: int = 32):
        # once-per-actor setup (the 'model load' slot)
        self._pil = _try_import_pil()
        if fake is None:
            fake = self._pil is None
        if not fake and self._pil is None:
            # codec boundary — libraries not available in this container
            raise NotImplementedError(
                "real image decode requires PIL; run with fake=True "
                "(or fake=None auto-detect) for the deterministic stub")
        self.fake = fake
        self.resize_to = resize_to
        self._hist_bins = np.arange(257)

    def _real_decode(self, payload: bytes, width: int,
                     height: int) -> np.ndarray:
        import io
        img = self._pil.open(io.BytesIO(payload)).convert("L")
        if self.resize_to:
            img = img.resize((self.resize_to, self.resize_to))
        return np.asarray(img, dtype=np.uint8)

    def _fake_decode(self, payload: bytes, width: int,
                     height: int) -> np.ndarray:
        """Deterministic stand-in for a codec: tile payload bytes into
        the declared (height x width) frame."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        need = int(width) * int(height)
        reps = -(-need // max(len(arr), 1))
        return np.tile(arr, reps)[:need].reshape(int(height), int(width))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.empty((batch.num_rows, 18), dtype=np.float64)
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_numpy()
        heights = batch.column("height").to_numpy()
        decode = self._fake_decode if self.fake else self._real_decode
        for i, p in enumerate(payloads):
            frame = decode(p, widths[i], heights[i])
            hist, _ = np.histogram(frame, bins=16, range=(0, 256))
            hist = hist / frame.size
            probs = hist[hist > 0]
            entropy = float(-(probs * np.log2(probs)).sum())
            feats[i, :16] = hist
            feats[i, 16] = entropy
            feats[i, 17] = frame.mean()
        flat = pa.array(feats.ravel(), pa.float64())
        return pa.table({
            "item_id": batch.column("item_id"),
            "media_type": batch.column("media_type"),
            "features": pa.FixedSizeListArray.from_arrays(flat, 18),
        })


def media_features_pipeline(ds: "ray.data.Dataset", concurrency: int = 2,
                            batch_size: int = 64,
                            fake: bool | None = True) -> "ray.data.Dataset":
    """Binary payloads need small batches: batch_size x payload size x
    concurrency bounds worker heap.  ``fake=True`` by default so the
    driver-facing rows-only check stays deterministic regardless of
    which codecs a node has; pass ``fake=None`` to auto-use PIL."""
    return ds.map_batches(DecodeStage, fn_constructor_kwargs={"fake": fake},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=0.5)
