"""Host-side stereo input pipeline feeding the TPU.

The capability this covers in the reference is a single producer thread
with a 2-deep queue (depthlib/threaded_stereo.py). Here the design centers
on keeping the chip busy instead: a decode stage turns two synchronized
sources into frame pairs, an optional transfer stage stages each pair into
device memory (jax.device_put) while the previous pair is still being
computed, and a bounded prefetch buffer with live/offline policies decides
what happens under backpressure:

- live policy (drop_newest=False, drop oldest): a camera must see fresh
  frames, so when compute falls behind, the oldest queued pair is evicted.
- offline policy (files): the producer blocks, every frame is processed.

The consumer side is an iterator (``for left, right in pipe:``); ``read``
/ ``start`` / ``stop`` are kept so the pipeline can slot where the
reference's capture object was.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from .input import _area_downscale_np, open_capture

__all__ = ["StereoInputPipeline", "ThreadedStereoCapture"]

_END = object()  # stream-end sentinel so consumers never rely on timeouts


class StereoInputPipeline:
    """Two-stage (decode -> [transfer] -> prefetch) stereo input pipeline.

    Args:
        left_source / right_source: anything io.input.open_capture accepts
            (device index, path, RTSP url) or an iterable of frames.
        downscale_factor: host-side area downscale applied at decode.
        prefetch: buffer depth (2 = classic double buffering).
        drop_frames: live policy — evict the oldest pair on overflow.
        to_device: stage frames into device memory on the producer thread
            so H2D copies overlap with compute. Off by default on CPU-only
            test environments; the video facade enables it on TPU.
    """

    def __init__(
        self,
        left_source,
        right_source,
        downscale_factor: float = 1.0,
        prefetch: int = 2,
        drop_frames: bool = False,
        to_device: bool = False,
    ):
        self._sources = (left_source, right_source)
        self._downscale = downscale_factor
        self._drop = drop_frames
        self._to_device = to_device
        self._buf: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
        self._quit = threading.Event()
        self._worker: Optional[threading.Thread] = None
        self._caps = None
        self.frames_dropped = 0
        self.frames_decoded = 0
        self.frames_failed = 0  # per-frame error isolation (SURVEY.md 5)

    # Consecutive decode failures tolerated before the stream is declared
    # dead (guards against spinning forever on a permanently broken source).
    MAX_CONSECUTIVE_FAILURES = 8

    # -- producer ---------------------------------------------------------
    def _decode_pair(self):
        cl, cr = self._caps
        ok_l, fl = cl.read()
        ok_r, fr = cr.read()
        if not (ok_l and ok_r) or fl is None or fr is None:
            return None
        if self._downscale != 1.0:
            fl = _area_downscale_np(fl, self._downscale)
            fr = _area_downscale_np(fr, self._downscale)
        return fl, fr

    def _produce(self):
        consecutive_failures = 0
        try:
            while not self._quit.is_set():
                # Per-frame error isolation: a corrupt frame (decode raise
                # or failed H2D) is counted and skipped; only a clean
                # end-of-stream or a run of failures ends the stream. The
                # reference kills the whole stream on any failure
                # (threaded_stereo.py:58-60).
                try:
                    pair = self._decode_pair()
                    if pair is None:
                        break
                    if self._to_device:
                        import jax

                        pair = tuple(jax.device_put(np.ascontiguousarray(f))
                                     for f in pair)
                except Exception:  # noqa: BLE001 — isolate the frame
                    self.frames_failed += 1
                    consecutive_failures += 1
                    if consecutive_failures >= self.MAX_CONSECUTIVE_FAILURES:
                        break
                    continue
                consecutive_failures = 0
                self.frames_decoded += 1
                if self._drop:
                    while True:
                        try:
                            self._buf.put_nowait(pair)
                            break
                        except queue.Full:
                            try:
                                self._buf.get_nowait()
                                self.frames_dropped += 1
                            except queue.Empty:
                                pass
                else:
                    while not self._quit.is_set():
                        try:
                            self._buf.put(pair, timeout=0.1)
                            break
                        except queue.Full:
                            continue
        finally:
            # Always deliver the end marker, but never at the cost of a real
            # frame under the offline (no-drop) policy — block until the
            # consumer drains, bailing out only once stop() was requested.
            while True:
                if self._quit.is_set():
                    try:
                        self._buf.put_nowait(_END)
                    except queue.Full:
                        pass
                    break
                try:
                    self._buf.put(_END, timeout=0.1)
                    break
                except queue.Full:
                    if self._drop:
                        try:
                            self._buf.get_nowait()
                            self.frames_dropped += 1
                        except queue.Empty:
                            pass

    # -- lifecycle / consumer ---------------------------------------------
    def start(self) -> "StereoInputPipeline":
        self._caps = (open_capture(self._sources[0]),
                      open_capture(self._sources[1]))
        self._quit.clear()
        self._worker = threading.Thread(
            target=self._produce, name="stereo-input", daemon=True
        )
        self._worker.start()
        return self

    def read(self, timeout: float = 5.0):
        """Next frame pair, or None at stream end."""
        try:
            item = self._buf.get(timeout=timeout)
        except queue.Empty:
            return None
        return None if item is _END else item

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            pair = self.read()
            if pair is None:
                return
            yield pair

    def stop(self):
        self._quit.set()
        if self._worker is not None:
            self._worker.join(timeout=2.0)
            self._worker = None
        if self._caps is not None:
            for c in self._caps:
                c.release()
            self._caps = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


class ThreadedStereoCapture(StereoInputPipeline):
    """Name kept for users coming from the reference API
    (depthlib/threaded_stereo.py); same object as StereoInputPipeline with
    the reference's constructor argument names."""

    def __init__(self, left_source, right_source, downscale_factor=1.0,
                 buffer_size: int = 2, drop_frames: bool = True,
                 device_put: bool = False):
        super().__init__(
            left_source, right_source, downscale_factor=downscale_factor,
            prefetch=buffer_size, drop_frames=drop_frames,
            to_device=device_put,
        )
