from mri_superresolution_tpu.evalsuite.baselines import (  # noqa: F401
    upscale_with_interpolation,
    sharpen3x3,
    INTERP_METHODS,
)
