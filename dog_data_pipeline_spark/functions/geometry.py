"""Bounding-box geometry as pure column expressions (SURVEY F6).

The reference implements these as per-row Python helpers
(``src/raw_to_samples.py:19-56``); here they are Catalyst expressions —
codegen-compiled, no Python in the hot path. Edge semantics preserved
exactly (documented per function): ceil-based recentering, two-step
clamp that shifts the box back inside the frame while PRESERVING its
extent, int truncation of max extents.

Bbox representation: ARRAY<DOUBLE>[4] = [x1, y1, x2, y2] (xyxy, as at
``src/raw_to_samples.py:189``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bbox_center(bbox: Column) -> Column:
    """[cx, cy] = [(x1+x2)/2, (y1+y2)/2] (``raw_to_samples.py:19-21``)."""
    return F.array(
        (bbox[0] + bbox[2]) / 2.0,
        (bbox[1] + bbox[3]) / 2.0,
    )


def bbox_dims(bbox: Column) -> Column:
    """[w, h] = [|x2-x1|, |y2-y1|] (``raw_to_samples.py:68-69``)."""
    return F.array(F.abs(bbox[2] - bbox[0]), F.abs(bbox[3] - bbox[1]))


def bbox_area(bbox: Column) -> Column:
    """(x2-x1)*(y2-y1) (``raw_to_samples.py:54-56``)."""
    return (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])


def recenter_clamp(
    bbox: Column, w: Column, h: Column, max_width: Column, max_height: Column
) -> Column:
    """Recenter a bbox to (w, h) extent and clamp inside the frame,
    preserving extent (``raw_to_samples.py:23-50`` exactly):

    1. new coords = ceil(center ± dim/2) — ceil on BOTH corners, so the
       box can be 1px off-center, matching the reference;
    2. clamp order matters and is preserved: first push x1/y1 to 0
       (setting x2=w / y2=h), then pull x2/y2 back to the frame edge
       (setting x1=x2-w / y1=y2-h). A box larger than the frame ends
       pinned to the max edge with a negative x1 — same as the
       reference;
    3. max_width/max_height are int-truncated before comparison.

    Returns ARRAY<BIGINT>[4] (the reference's ints).
    """
    mw = max_width.cast("int")
    mh = max_height.cast("int")
    cx = (bbox[0] + bbox[2]) / 2.0
    cy = (bbox[1] + bbox[3]) / 2.0
    x1 = F.ceil(cx - w / 2).cast("long")
    y1 = F.ceil(cy - h / 2).cast("long")
    x2 = F.ceil(cx + w / 2).cast("long")
    y2 = F.ceil(cy + h / 2).cast("long")
    # step 1: left/top pushback
    x2 = F.when(x1 < 0, w.cast("long")).otherwise(x2)
    x1 = F.when(x1 < 0, F.lit(0).cast("long")).otherwise(x1)
    y2 = F.when(y1 < 0, h.cast("long")).otherwise(y2)
    y1 = F.when(y1 < 0, F.lit(0).cast("long")).otherwise(y1)
    # step 2: right/bottom pullback
    x1 = F.when(x2 > mw, (mw - w).cast("long")).otherwise(x1)
    x2 = F.when(x2 > mw, mw.cast("long")).otherwise(x2)
    y1 = F.when(y2 > mh, (mh - h).cast("long")).otherwise(y1)
    y2 = F.when(y2 > mh, mh.cast("long")).otherwise(y2)
    return F.array(x1, y1, x2, y2)
