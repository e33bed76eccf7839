from mri_superresolution_tpu.data.dataset import (  # noqa: F401
    PairedSliceDataset,
    BatchLoader,
    StreamingBatchLoader,
    train_val_split,
    subject_split,
)
from mri_superresolution_tpu.data.extraction import (  # noqa: F401
    extract_slices_3d,
    extract_from_nifti,
    find_nifti_files,
    generate_bids_identifier,
    generate_filename,
    select_slice_indices,
)
