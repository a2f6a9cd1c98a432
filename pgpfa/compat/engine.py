"""Shim for the reference's ``funs/engine.py`` (the fit class)."""

from pgpfa.em.fit import PPGPFAfit  # noqa: F401
