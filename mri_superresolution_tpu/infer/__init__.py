from mri_superresolution_tpu.infer.engine import (  # noqa: F401
    InferenceEngine,
    load_engine,
    preprocess_image_array,
)
