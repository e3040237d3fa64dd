from robosuite_tpu.renderers.raycast import RaycastRenderer, render_camera  # noqa: F401
from robosuite_tpu.renderers.viewer import MjViewerRenderer, OpenCVViewer  # noqa: F401
