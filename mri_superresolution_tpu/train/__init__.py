from mri_superresolution_tpu.train.trainer import (  # noqa: F401
    TrainState,
    build_eval_step,
    build_train_step,
    make_optimizer,
    train,
)
from mri_superresolution_tpu.train.plateau import (  # noqa: F401
    EarlyStopping,
    ReduceLROnPlateau,
)
