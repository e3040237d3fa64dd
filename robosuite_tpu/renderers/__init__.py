from robosuite_tpu.renderers.raycast import RaycastRenderer, render_camera  # noqa: F401
