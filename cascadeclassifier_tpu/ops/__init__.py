from cascadeclassifier_tpu.ops.integral import (  # noqa: F401
    integral_image,
    integral_sq,
    integral_tilted,
    integral_all,
    window_norm_factor,
)
