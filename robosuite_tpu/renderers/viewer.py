"""On-screen / recording viewers over the ray-cast renderer.

Re-derivation of the reference viewer layer
(reference renderers/viewer/opencv_renderer.py:10-90 ``OpenCVViewer`` and
renderers/viewer/mjviewer_renderer.py:11 ``MjviewerRenderer``): small
host-side frontends that pull frames from the offscreen renderer and either
display them (cv2 window, hardware/display-gated exactly like the reference's
GL windows) or accumulate them for video export.

TPU-native inversion: frames come from the in-graph ray-cast renderer
(renderers/raycast.py) — one jitted render fn per camera — so the same
viewer works on a headless TPU host; display is optional sugar.
"""

from __future__ import annotations

import numpy as np

from robosuite_tpu.renderers.raycast import RaycastRenderer

import os

try:  # display path is optional, like the reference's cv2/GL dependency
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover - image-dependent
    cv2 = None
    _HAS_CV2 = False

# cv2.imshow on a host with no display server aborts the process (it is not a
# catchable cv2.error), so the window path is gated on an actual display —
# same hardware-gating policy as the teleop devices (devices/*.py).
_HAS_DISPLAY = _HAS_CV2 and bool(
    os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")
)


class OpenCVViewer:
    """Multi-camera viewer (reference opencv_renderer.py:10-90).

    ``render(state)`` concatenates the configured cameras horizontally and, if
    a cv2 display is available, shows the frame in a window; either way the
    composited frame is returned (and optionally recorded) so headless hosts
    get the identical pixels.
    """

    def __init__(self, env, camera_names=("agentview",), height=256, width=256,
                 record=False, window_name="offscreen render"):
        if isinstance(camera_names, str):
            camera_names = [camera_names]
        self.env = env
        self.camera_names = list(camera_names)
        self.height = height
        self.width = width
        self.record = record
        self.frames = []
        self._window_name = window_name
        self._has_window = False
        self.keypress_callback = None
        self._renderers = {}
        self.set_camera(camera_name=self.camera_names, height=height, width=width)

    # reference opencv_renderer.py:22-48
    def set_camera(self, camera_id=None, camera_name=None, height=None, width=None):
        assert (camera_id is not None) or (camera_name is not None)
        if height is not None:
            self.height = height
        if width is not None:
            self.width = width
        if camera_id is not None:
            ids = [camera_id] if isinstance(camera_id, int) else list(camera_id)
            names = [self.env.model.cam_names[i] for i in ids]
        else:
            names = [camera_name] if isinstance(camera_name, str) else list(camera_name)
        self.camera_names = names
        self.frames = []  # geometry changed: recorded frames no longer stack
        self._renderers = {
            name: RaycastRenderer(self.env, name, self.height, self.width)
            for name in self.camera_names
        }

    def render(self, state):
        """Render + (maybe) display one frame; returns the uint8 HxWx3 image
        (cameras concatenated horizontally, reference opencv_renderer.py:50-61)."""
        ims = [self._renderers[name].render(state)[0] for name in self.camera_names]
        frame = np.concatenate([np.asarray(im, dtype=np.uint8) for im in ims], axis=1)
        if self.record:
            self.frames.append(frame)
        if _HAS_DISPLAY:
            try:
                cv2.imshow(self._window_name, frame[..., ::-1])
                self._has_window = True
                key = cv2.waitKey(1)
                if self.keypress_callback is not None and key != -1:
                    self.keypress_callback(key)
            except cv2.error:  # display vanished — stay headless
                pass
        return frame

    def add_keypress_callback(self, keypress_callback):
        self.keypress_callback = keypress_callback  # reference :69-70

    def save_video(self, path, fps=20):
        """Write recorded frames to ``path`` (.mp4 via cv2 if present, else
        .npy stack) — the TPU-host analog of demo_video_recording.py."""
        if not self.frames:
            raise ValueError("no frames recorded; construct with record=True")
        if _HAS_CV2 and str(path).endswith(".mp4"):
            h, w = self.frames[0].shape[:2]
            out = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
            for f in self.frames:
                out.write(f[..., ::-1])
            out.release()
        else:
            np.save(str(path), np.stack(self.frames))
        return path

    def close_window(self):  # reference :72-79
        if _HAS_DISPLAY and self._has_window:
            try:
                cv2.destroyWindow(self._window_name)
            except cv2.error:
                pass
        self._has_window = False

    def close(self):  # reference :81-90
        self.close_window()
        self.frames = []


class MjViewerRenderer:
    """Passive-viewer analog (reference mjviewer_renderer.py:11-76).

    The reference opens ``mujoco.viewer`` over live sim memory; without a GUI
    toolkit on a TPU host this maps to the same OpenCVViewer loop, so this
    class is a thin alias kept for API parity (``render``/``close`` +
    ``update`` no-op, matching the reference's surface).
    """

    def __init__(self, env, camera_names=("agentview",), height=256, width=256):
        self._viewer = OpenCVViewer(env, camera_names, height, width)

    def render(self, state):
        return self._viewer.render(state)

    def update(self):  # reference mjviewer_renderer.py sync point
        pass

    def close(self):
        self._viewer.close()
