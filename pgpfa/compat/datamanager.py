"""Shim for the reference's ``funs/datamanager.py``."""

from pgpfa.data.loaders import MATLABdataset, StevensonDataset  # noqa: F401
