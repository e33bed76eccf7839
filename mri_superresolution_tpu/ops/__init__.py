"""Pure-jnp, jittable image/compute kernels (no I/O).

Everything here is shape-static and traceable, designed to lower well onto
TPU (MXU matmuls for resampling, XLA FFT for k-space, fused elementwise).
"""

from mri_superresolution_tpu.ops.resize import (  # noqa: F401
    Interp,
    resize,
    resample_matrix,
    letterbox_resize,
    letterbox_geometry,
    center_crop,
    pad_to_size,
    upsample_bilinear_align_corners,
)
from mri_superresolution_tpu.ops.normalize import (  # noqa: F401
    robust_normalize,
    minmax_normalize,
    percentile_window,
    apply_windowing,
    histogram_equalization,
)
from mri_superresolution_tpu.ops.kspace import simulate_low_field_mri  # noqa: F401
from mri_superresolution_tpu.ops.ssim import ssim, gaussian_window  # noqa: F401
from mri_superresolution_tpu.ops.metrics import (  # noqa: F401
    psnr,
    mse,
    rmse,
    mae,
    match_histograms,
)
