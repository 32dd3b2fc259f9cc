from .loader import ArrayLoader
from . import cifar10, digits, galaxy, imagenet, mnist, synthetic, toy

__all__ = ["ArrayLoader", "cifar10", "galaxy", "imagenet",
           "digits", "mnist", "synthetic", "toy"]
