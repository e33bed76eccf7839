from mri_superresolution_tpu.losses.combined import (  # noqa: F401
    CombinedLoss,
    l1_loss,
)
