"""Small utilities shared by examples and tools."""

from .wav import write_wav

__all__ = ["write_wav"]
