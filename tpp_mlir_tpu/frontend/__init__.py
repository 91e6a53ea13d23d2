"""Frontends: importers from external model formats into the tensor IR."""

from .torch_import import import_torch

__all__ = ["import_torch"]
