"""Threaded stereo frame capture — the host half of the two-stage
capture/compute pipeline.

Reference analogue: depthlib/threaded_stereo.py (producer thread + bounded
queue, drop-oldest for live cameras). This generalizes to the TPU input
pipeline: the producer thread optionally pre-transfers frames to device
(jax.device_put) so capture, H2D copy and compute overlap (double
buffering via queue depth).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional, Tuple

import numpy as np

from .input import _area_downscale_np, open_capture

__all__ = ["ThreadedStereoCapture"]


class ThreadedStereoCapture:
    """Producer thread reading both sources into a bounded queue.

    Parity with ThreadedStereoCapture (threaded_stereo.py:9-90): queue
    maxsize = buffer_size (default 2), drop-oldest when drop_frames is set,
    read() with 1 s timeout returning None at stream end, stop() joins and
    releases.
    """

    def __init__(
        self,
        left_source,
        right_source,
        downscale_factor: float = 1.0,
        buffer_size: int = 2,
        drop_frames: bool = True,
        device_put: bool = False,
    ):
        self.left_source = left_source
        self.right_source = right_source
        self.downscale_factor = downscale_factor
        self.buffer_size = buffer_size
        self.drop_frames = drop_frames
        self.device_put = device_put

        self._frame_queue: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._stop_event = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._cap_l = None
        self._cap_r = None

    def start(self):
        self._cap_l = open_capture(self.left_source)
        self._cap_r = open_capture(self.right_source)
        self._stop_event.clear()
        self._thread = threading.Thread(target=self._capture_loop, daemon=True)
        self._thread.start()

    def _read_frame(self, cap) -> Optional[np.ndarray]:
        ok, frame = cap.read()
        if not ok or frame is None:
            return None
        return _area_downscale_np(frame, self.downscale_factor)

    def _capture_loop(self):
        while not self._stop_event.is_set():
            if self._cap_l is None or self._cap_r is None:
                self._stop_event.set()
                break
            left = self._read_frame(self._cap_l)
            right = self._read_frame(self._cap_r)
            if left is None or right is None:
                self._stop_event.set()
                break
            if self.device_put:
                import jax

                left = jax.device_put(left)
                right = jax.device_put(right)
            if self.drop_frames and self._frame_queue.full():
                try:
                    self._frame_queue.get_nowait()
                except queue.Empty:
                    pass
            self._frame_queue.put((left, right))

    def read(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Next frame pair, or None when the stream has ended."""
        if self._stop_event.is_set() and self._frame_queue.empty():
            return None
        try:
            return self._frame_queue.get(timeout=1.0)
        except queue.Empty:
            return None

    def stop(self):
        self._stop_event.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        if self._cap_l is not None:
            self._cap_l.release()
            self._cap_l = None
        if self._cap_r is not None:
            self._cap_r.release()
            self._cap_r = None
