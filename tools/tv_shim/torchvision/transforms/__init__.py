from . import functional
from .functional import to_tensor


class ToTensor:
    """PIL Image / ndarray -> CHW float tensor in [0, 1] (torchvision
    semantics for uint8 inputs)."""

    def __call__(self, pic):
        return to_tensor(pic)

    def __repr__(self):
        return "ToTensor()"


class Compose:
    def __init__(self, transforms_list):
        self.transforms = list(transforms_list)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x

    def __repr__(self):
        return f"Compose({self.transforms!r})"
