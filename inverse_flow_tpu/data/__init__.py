from .loader import ArrayLoader
from . import (cifar10, digits, galaxy, imagenet, mnist, patches,
               synthetic, toy)

__all__ = ["ArrayLoader", "cifar10", "galaxy", "imagenet",
           "digits", "mnist", "patches", "synthetic", "toy"]
