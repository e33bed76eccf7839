from mri_superresolution_tpu.infer.engine import (  # noqa: F401
    InferenceEngine,
    load_engine,
    preprocess_image_array,
)
from mri_superresolution_tpu.infer.export import (  # noqa: F401
    ServingArtifact,
    export_artifact,
    load_artifact,
)
from mri_superresolution_tpu.infer.server import (  # noqa: F401
    DynamicBatcher,
    serve_http,
)
