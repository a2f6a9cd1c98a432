"""Trial minibatching helpers (online EM).

Reference: ``subsampleTrials``/``seenTrials`` (``funs/util.py:449-473``). The
fused online fit subsamples on-device with ``jax.random.choice`` inside the
scan (``pgpfa/em/fit.py``); these host-side helpers exist for API parity and
for user code structured like the reference.
"""

from __future__ import annotations

import copy

import numpy as np


def subsample_trials(experiment, batch_size: int, rng=None):
    """Random without-replacement minibatch of trials
    (reference ``funs/util.py:459-473``)."""
    rng = rng or np.random.default_rng()
    n = len(experiment.data)
    idx = rng.choice(n, size=batch_size, replace=False)
    sub = copy.copy(experiment)
    sub.data = [experiment.data[i] for i in idx]
    sub.numTrials = batch_size
    sub.batchTrIdx = idx
    if hasattr(sub, "Y"):
        sub.Y = experiment.Y[idx]
    return sub


def seen_trials(experiment, seen_idx):
    """Union-of-seen-trials view (reference ``funs/util.py:449-457``)."""
    idx = np.asarray(seen_idx).reshape(-1)
    sub = copy.copy(experiment)
    sub.data = [experiment.data[i] for i in idx]
    sub.numTrials = len(idx)
    if hasattr(sub, "Y"):
        sub.Y = experiment.Y[idx]
    return sub


# reference-API aliases
subsampleTrials = subsample_trials
seenTrials = seen_trials
