from manus_tpu.ops.rasterizer.api import render_gaussians, RenderOutput  # noqa: F401
