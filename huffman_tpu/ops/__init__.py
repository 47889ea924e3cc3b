from . import decode, encode, histogram, tables

__all__ = ["decode", "encode", "histogram", "tables"]
