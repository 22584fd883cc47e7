"""Batched TPU embedding extraction."""

from .extractor import Extractor, make_length_buckets

__all__ = ["Extractor", "make_length_buckets"]
