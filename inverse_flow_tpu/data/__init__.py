from .loader import ArrayLoader
from . import mnist, cifar10, imagenet, toy, synthetic

__all__ = ["ArrayLoader", "mnist", "cifar10", "imagenet", "toy", "synthetic"]
