from .image import ImageFolder, load_image, save_image
from .loader import BatchLoader

__all__ = ["ImageFolder", "BatchLoader", "load_image", "save_image"]
