from mri_superresolution_tpu.utils.logging import (  # noqa: F401
    log_message,
    setup_logging,
)
