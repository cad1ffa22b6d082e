"""Codec boundary for multimodal payloads.

Real decoding needs cv2/ffmpeg — NOT present in this environment, so:
- ``FAKEVID``: a deterministic toy container used by tests — header
  ``FAKEVID|fps|w|h|n`` then n raw frames of w*h bytes. It exercises the
  full plumbing (bytes → frames → crops → bytes) with real data flow.
- real formats: STUB — ``decode_video``/``encode_video`` raise
  NotImplementedError unless cv2 imports (gated, never at module load).
"""

from __future__ import annotations

MAGIC = b"FAKEVID"


def make_fake_video(fps: int, width: int, height: int, frames: list[bytes]) -> bytes:
    assert all(len(f) == width * height for f in frames)
    head = b"|".join(
        [MAGIC, str(fps).encode(), str(width).encode(), str(height).encode(), str(len(frames)).encode()]
    )
    return head + b"\n" + b"".join(frames)


def probe(content: bytes) -> tuple[int, int, int, int]:
    """-> (frame_count, height, width, fps); mirrors the reference's
    metadata probe (``raw_to_samples.py:302-307``)."""
    if content.startswith(MAGIC):
        head, _, _ = content.partition(b"\n")
        _, fps, w, h, n = head.split(b"|")
        return int(n), int(h), int(w), int(fps)
    return _real_probe(content)


def decode_video(content: bytes) -> tuple[int, list[bytes]]:
    """-> (fps, [frame bytes in order])."""
    if content.startswith(MAGIC):
        head, _, body = content.partition(b"\n")
        _, fps, w, h, n = head.split(b"|")
        w, h, n = int(w), int(h), int(n)
        size = w * h
        return int(fps), [body[i * size : (i + 1) * size] for i in range(n)]
    return _real_decode(content)


def encode_video(fps: int, width: int, height: int, frames: list[bytes]) -> bytes:
    if all(len(f) == width * height for f in frames):
        return make_fake_video(fps, width, height, frames)
    return _real_encode(fps, width, height, frames)


def crop_frame(frame: bytes, width: int, bbox: tuple[int, int, int, int]) -> bytes:
    """Row-major byte-grid crop — real slicing on the fake format; the
    cv2 path would be ``frame[y1:y2, x1:x2]`` (``raw_to_samples.py:251``).

    Coordinates are clipped to the frame: a max-extent box larger than
    the frame legitimately carries out-of-frame corners after the
    extent-preserving clamp (negative x1/y1), and slicing must not wrap
    (numpy's negative-index slicing silently would — a latent reference
    bug we do not reproduce).
    """
    x1, y1, x2, y2 = (int(v) for v in bbox)
    height = len(frame) // width if width else 0
    x1, x2 = max(x1, 0), min(x2, width)
    y1, y2 = max(y1, 0), min(y2, height)
    rows = []
    for y in range(y1, y2):
        rows.append(frame[y * width + x1 : y * width + x2])
    return b"".join(rows)


def _require_cv2():
    try:
        import cv2  # noqa: F401

        return cv2
    except ImportError as e:  # pragma: no cover - env without cv2
        raise NotImplementedError(
            "real video codecs need cv2/ffmpeg, which this environment "
            "does not ship; only the FAKEVID test container is supported"
        ) from e


def _real_probe(content: bytes):  # pragma: no cover - needs cv2
    _require_cv2()
    raise NotImplementedError("real container probing not implemented")


def _real_decode(content: bytes):  # pragma: no cover - needs cv2
    _require_cv2()
    raise NotImplementedError("real container decoding not implemented")


def _real_encode(fps, width, height, frames):  # pragma: no cover - needs cv2
    _require_cv2()
    raise NotImplementedError("real container encoding not implemented")
