"""Image operators over BINARY columns (north-star multimodal: the
image analog of ``video.py``/``audio.py`` — decode, resize,
feature-extract as Arrow-batched UDFs).

Same contract as the other modalities: containers are the only thing
that crosses an exchange; decode + transform + reduce fuse into one
mapInPandas pass so raw pixel grids never shuffle. Real codecs
(PNG/JPEG via PIL/cv2) are absent from this environment — ``FAKEIMG``
exercises the plumbing with real data flow behind the same import-gate
pattern as ``codec._require_cv2``.

FAKEIMG layout: ``FAKEIMG|width|height`` + ``\\n`` + width*height
row-major grayscale bytes (one frame of the FAKEVID grid).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_MAGIC = b"FAKEIMG"

IMAGE_STATS_SCHEMA = (
    "image_id STRING, width INT, height INT, out_width INT, out_height INT, "
    "mean_px DOUBLE, min_px INT, max_px INT"
)


def make_fake_image(width: int, height: int, pixels: "np.ndarray") -> bytes:
    arr = np.asarray(pixels, dtype=np.uint8).reshape(height, width)
    head = b"|".join([IMAGE_MAGIC, str(width).encode(), str(height).encode()])
    return head + b"\n" + arr.tobytes()


def probe_image_bytes(content: bytes) -> tuple[int, int]:
    """-> (width, height) from the header only."""
    if content.startswith(IMAGE_MAGIC):
        head, _, _ = content.partition(b"\n")
        _, w, h = head.split(b"|")
        return int(w), int(h)
    return _real_probe_image(content)


def decode_image(content: bytes) -> "np.ndarray":
    """-> uint8 (height, width) grayscale grid."""
    if content.startswith(IMAGE_MAGIC):
        head, _, body = content.partition(b"\n")
        _, w, h = head.split(b"|")
        w, h = int(w), int(h)
        return np.frombuffer(body, dtype=np.uint8, count=w * h).reshape(h, w)
    return _real_decode_image(content)


def pool_resize(img: "np.ndarray", factor: int) -> "np.ndarray":
    """Average-pool downscale by an integer factor (truncating division —
    deterministic integer arithmetic, so an SQL oracle can replicate it).
    Trailing rows/cols that don't fill a full block are dropped."""
    h, w = img.shape
    h2, w2 = h // factor, w // factor
    x = img[: h2 * factor, : w2 * factor].astype(np.uint32)
    blocks = x.reshape(h2, factor, w2, factor).sum(axis=(1, 3))
    return (blocks // (factor * factor)).astype(np.uint8)


def resize_images(
    binary_df: DataFrame,
    factor: int,
    image_id_col: str = "image_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode → average-pool → re-encode inside one Arrow batch; only
    containers cross the exchange."""

    @F.pandas_udf("binary")
    def _resize(content: pd.Series) -> pd.Series:
        out = []
        for c in content:
            img = pool_resize(decode_image(bytes(c)), factor)
            out.append(make_fake_image(img.shape[1], img.shape[0], img))
        return pd.Series(out)

    return binary_df.withColumn(content_col, _resize(F.col(content_col)))


def image_resize_stats(
    binary_df: DataFrame,
    factor: int,
    image_id_col: str = "image_id",
    content_col: str = "content",
) -> DataFrame:
    """Fused decode + resize + reduce in ONE mapInPandas pass: emits
    per-image stats of the POOLED grid (dims, mean/min/max pixel) —
    the pixel grids never leave the task."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "image_id": [], "width": [], "height": [],
                "out_width": [], "out_height": [],
                "mean_px": [], "min_px": [], "max_px": [],
            }
            for iid, content in zip(pdf[image_id_col], pdf[content_col]):
                img = decode_image(bytes(content))
                pooled = pool_resize(img, factor)
                out["image_id"].append(iid)
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["out_height"].append(pooled.shape[0])
                out["out_width"].append(pooled.shape[1])
                out["mean_px"].append(float(pooled.mean()))
                out["min_px"].append(int(pooled.min()))
                out["max_px"].append(int(pooled.max()))
            yield pd.DataFrame(out)

    return binary_df.select(image_id_col, content_col).mapInPandas(
        _stats, IMAGE_STATS_SCHEMA
    )


def dhash_images(
    binary_df: DataFrame,
    factor: int = 4,
    image_id_col: str = "image_id",
    content_col: str = "content",
    out: str = "dhash",
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: 56-bit gradient
    signature over the average-pooled grayscale grid.

    bit(y, x) = [pooled[y][x+1] > pooled[y][x]] for y in 0..7, x in 0..6
    (shift = y*7 + x), computed on the first 8x8 of ``pool_resize``'s
    truncating-integer downscale — every step is integer arithmetic, so
    a SQL oracle can replay the hash closed-form, and 56 bits keeps the
    signature strictly positive in an int64 (no sign-bit headaches in
    cross-engine xor/bit_count).

    Near-duplicate images (re-encodes, small edits, resizes) land
    within a few bits of hamming distance; pair generation reuses the
    text-SimHash pigeonhole blocking (``operators.dedup
    .simhash_pairs_pigeonhole`` with these hashes as the signature
    table), which guarantees recall at hamming <= h without an
    all-pairs join. Decode + pool + hash fuse into one mapInPandas
    pass — pixel grids never leave the task; only (id, int64) rows
    shuffle. Image analog of the reference's frame pipeline
    (raw_to_samples.py:173-196 decode path), applied to corpus dedup.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    # derive the id field from the input so non-long ids keep working
    id_field = binary_df.schema[image_id_col]
    schema = StructType([id_field, StructField(out, LongType())])
    shifts = (np.arange(8)[:, None] * 7 + np.arange(7)[None, :]).astype(np.uint64)

    def _dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for iid, content in zip(pdf[image_id_col], pdf[content_col]):
                g = pool_resize(decode_image(bytes(content)), factor)
                if g.shape[0] < 8 or g.shape[1] < 8:
                    raise ValueError(
                        f"image too small for dhash after pooling: {g.shape}"
                    )
                g = g[:8, :8].astype(np.int64)
                bits = (g[:, 1:] > g[:, :-1]).astype(np.uint64)
                ids.append(iid)
                hashes.append(int((bits << shifts).sum()))
            yield pd.DataFrame({image_id_col: ids, out: hashes})

    return binary_df.select(image_id_col, content_col).mapInPandas(_dhash, schema)


def write_image_dirs(
    df: DataFrame,
    root: str,
    key_col: str = "subject_id",
    idx_col: str = "frame_idx",
    content_col: str = "content",
    ext: str = "png",
    pad: int = 5,
) -> None:
    """Partitioned image sink (SURVEY S10): one directory per key, one
    file per frame, zero-padded names — the reference's
    ``frames/{sub_id}/frame-{i:05}.png`` layout (``raw_to_samples.py:
    111-121,251-254``), which downstream stages re-key by PARSING THE
    PATH. Executor-side ``foreachPartition`` writer: each task writes
    its own rows straight to storage (no driver collect, no shuffle —
    at 100 TB the write parallelism is the upstream partitioning);
    ``makedirs`` is idempotent and each file is written to a temp name
    then ``os.rename``d into place (atomic on posix — the local/posix
    assumption, same as build_ivf_index's sidecar), so a speculative
    duplicate attempt or a mid-job reader never sees a torn file: both
    attempts write identical bytes and the last rename wins whole.

    Temp hygiene: a failed write unlinks its own temp before the error
    propagates, and a successful rename sweeps any ``.{name}.*.tmp``
    predecessors for the SAME frame left by an attempt that was killed
    between open and rename (they are dot-hidden from Spark listings
    but would otherwise accumulate on storage). Sweeping is per-target
    — a concurrent writer of a DIFFERENT frame is never touched; if a
    sweep races a live duplicate attempt of the same frame, the loser's
    rename sees ENOENT, finds the final file already in place (both
    attempts write identical bytes by contract) and treats it as a win.
    """
    import glob as _glob
    import os
    import uuid

    key_c, idx_c, content_c = key_col, idx_col, content_col

    def _write(rows) -> None:
        for row in rows:
            d = os.path.join(root, str(row[key_c]))
            os.makedirs(d, exist_ok=True)
            name = f"frame-{int(row[idx_c]):0{pad}d}.{ext}"
            final = os.path.join(d, name)
            tmp = os.path.join(d, f".{name}.{uuid.uuid4().hex}.tmp")
            try:
                with open(tmp, "wb") as fh:
                    fh.write(bytes(row[content_c]))
                os.rename(tmp, final)
            except OSError:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                if not os.path.exists(final):
                    raise
            for stale in _glob.glob(
                os.path.join(d, f".{name}.*.tmp")
            ):
                try:
                    os.unlink(stale)
                except OSError:  # a live racer already renamed/removed it
                    pass

    df.select(key_col, idx_col, content_col).foreachPartition(_write)


def _require_image_codec():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError as e:  # pragma: no cover - env without PIL
        raise NotImplementedError(
            "real image codecs need PIL/cv2, which this environment does "
            "not ship; only the FAKEIMG container is supported"
        ) from e


def _real_probe_image(content: bytes):  # pragma: no cover - needs PIL
    import io

    Image = _require_image_codec()
    with Image.open(io.BytesIO(content)) as im:
        return im.width, im.height


def _real_decode_image(content: bytes):  # pragma: no cover - needs PIL
    import io

    Image = _require_image_codec()
    with Image.open(io.BytesIO(content)) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)
