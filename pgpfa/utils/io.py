"""Persistence and console helpers.

Reference: pickle save/load (``funs/util.py:369-375``), one-line progress
printer (``funs/util.py:121-128``), tic/toc (``funs/util.py:491-500``),
p-value glyphs (``funs/util.py:41-51``). Checkpoint/resume for fits goes
beyond the reference's pickle-anything story: :func:`save_checkpoint` /
:func:`load_checkpoint` store ``(params, warm-start state, em_iter, rng key)``
so a run can resume mid-fit (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import pickle
import sys
import time
from typing import Any, Optional

import numpy as np


def save_variables(variable: Any, filename: str) -> None:
    """Pickle any object (reference ``saveVariables``)."""
    with open(filename, "wb") as f:
        pickle.dump(variable, f)


def open_variables(filename: str) -> Any:
    """Unpickle (reference ``openVariables``)."""
    with open(filename, "rb") as f:
        return pickle.load(f)


# reference-API aliases
saveVariables = save_variables
openVariables = open_variables


def save_checkpoint(filename: str, params, em_iter: int, warm=None, rng_key=None, extra=None):
    """Checkpoint a fit's resumable state as an .npz.

    The write is ATOMIC (tmp file + ``os.replace``): the subprocess-isolated
    driver (:func:`pgpfa.em.isolated.fit_isolated`) may kill a wedged worker
    mid-write, and a torn checkpoint must not poison the retry."""
    import os

    payload = {
        "C": np.asarray(params["C"]),
        "d": np.asarray(params["d"]),
        "tau": np.asarray(params["tau"]),
        "em_iter": np.asarray(em_iter),
    }
    if warm is not None:
        payload["warm"] = np.asarray(warm)
    if rng_key is not None:
        payload["rng_key"] = np.asarray(rng_key)
    if extra:
        for k, v in extra.items():
            payload["extra_" + k] = np.asarray(v)
    final = filename if filename.endswith(".npz") else filename + ".npz"
    tmp = final + ".tmp.npz"  # np.savez appends .npz unless already suffixed
    np.savez(tmp, **payload)
    os.replace(tmp, final)


def load_checkpoint(filename: str):
    """Load a checkpoint written by :func:`save_checkpoint`."""
    blob = np.load(filename)
    out = {
        "params": {"C": blob["C"], "d": blob["d"], "tau": blob["tau"]},
        "em_iter": int(blob["em_iter"]),
        "warm": blob["warm"] if "warm" in blob else None,
        "rng_key": blob["rng_key"] if "rng_key" in blob else None,
        "extra": {k[6:]: blob[k] for k in blob.files if k.startswith("extra_")},
    }
    return out


def print_options_banner(title: str, rows) -> None:
    """ASCII options box (reference ``funs/engine.py:157-178``,
    ``funs/util.py:673-694``).

    Args:
        rows: iterable of ``(label, value)`` pairs.
    """
    width = 55
    print("+" + f" {title} ".center(width, "-") + "+")
    for label, value in rows:
        body = f" {label}: "
        val = f"{value} "
        pad = width - len(body) - len(val)
        print("|" + body + " " * max(pad, 1) + val + "|")
    print("+" + "-" * width + "+")


class Printer:
    """One-line-rewrite progress printer (reference ``funs/util.py:121-128``)."""

    def __init__(self, data):
        sys.stdout.write("\r\x1b[K" + str(data))
        sys.stdout.flush()

    @staticmethod
    def stdout(message: str):
        sys.stdout.write(message)
        sys.stdout.write("\b" * len(message))


_TIC: Optional[float] = None


def tic():
    global _TIC
    _TIC = time.time()


def toc():
    if _TIC is None:
        print("Toc: start time not set")
    else:
        print(f"Elapsed time is {time.time() - _TIC} seconds.")


def stars(p: float) -> str:
    """Significance glyphs (reference ``funs/util.py:41-51``)."""
    if p < 0.0001:
        return "****"
    if p < 0.001:
        return "***"
    if p < 0.01:
        return "**"
    if p < 0.05:
        return "*"
    return "-"
