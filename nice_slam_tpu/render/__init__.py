from nice_slam_tpu.render.renderer import (
    RenderConfig,
    SceneModel,
    eval_raw,
    render_rays,
    render_image,
    regulation_sigma,
)
