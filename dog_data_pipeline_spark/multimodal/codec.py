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


def _spool(content: bytes, suffix: str = ".mp4") -> str:
    """cv2.VideoCapture reads paths, not buffers — spool bytes to a temp
    file (the container sniffs content, so the suffix is advisory)."""
    import tempfile

    f = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
    f.write(content)
    f.close()
    return f.name


def _real_probe(content: bytes):  # pragma: no cover - needs cv2
    """Real-container probe, mirroring ``get_video_metadata``
    (``raw_to_samples.py:302-307``): rounded fps, int-cast dims/count."""
    import os

    cv2 = _require_cv2()
    path = _spool(content)
    try:
        cap = cv2.VideoCapture(path)
        try:
            fps = round(cap.get(cv2.CAP_PROP_FPS))
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        finally:
            cap.release()
        return n, h, w, fps
    finally:
        os.unlink(path)


def _real_decode(content: bytes):  # pragma: no cover - needs cv2
    """Real-container decode (``initial_tracking``'s read loop,
    ``raw_to_samples.py:173-196``). Frames are returned GRAYSCALE so the
    single-byte-per-pixel row-major grid contract (``crop_frame``) holds
    for every container; color support would add a channels axis to the
    frame schema, not change this path's shape."""
    import os

    cv2 = _require_cv2()
    path = _spool(content)
    try:
        cap = cv2.VideoCapture(path)
        frames: list[bytes] = []
        try:
            fps = round(cap.get(cv2.CAP_PROP_FPS))
            while cap.isOpened():
                ok, frame = cap.read()
                if not ok:
                    break
                gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
                frames.append(gray.tobytes())
        finally:
            cap.release()
        return fps, frames
    finally:
        os.unlink(path)


def _real_encode(fps, width, height, frames):  # pragma: no cover - needs cv2
    """Real-container encode (``create_video``, ``raw_to_samples.py:
    125-144``): mp4v fourcc VideoWriter at (width, height); grayscale
    byte-grid frames are expanded to BGR for the writer."""
    import os

    cv2 = _require_cv2()
    import numpy as np

    path = _spool(b"", suffix=".mp4")
    try:
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
        )
        try:
            for f in frames:
                gray = np.frombuffer(f, dtype=np.uint8).reshape(height, width)
                writer.write(cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR))
        finally:
            writer.release()
        with open(path, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(path)
