"""Stevenson-2011-shaped benchmark surrogate.

The real ``data/Stevenson_2011_e1.mat`` blob is stripped from the mounted
reference (``/root/reference/.MISSING_LARGE_BLOBS``), so benchmarks use a
synthetic dataset with the same shape as the loader would produce
(reference ``funs/datamanager.py:11-16``: ~90-100 units, 1400 ms trials,
10 ms bins -> T=140, ~100 trials) and physiological firing rates (~10 Hz).
"""

from __future__ import annotations

from pgpfa.data.synthetic import dataset

STEVENSON_SHAPE = dict(ydim=90, trialDur=1400, binSize=10, numTrials=100)


def stevenson_surrogate(xdim: int = 5, seed: int = 2011, numTrials: int = 100) -> dataset:
    """Synthetic dataset shaped like the Stevenson-2011 recording."""
    import numpy as np

    return dataset(
        xdim=xdim,
        ydim=STEVENSON_SHAPE["ydim"],
        numTrials=numTrials,
        trialDur=STEVENSON_SHAPE["trialDur"],
        binSize=STEVENSON_SHAPE["binSize"],
        dOffset=-1.3,  # ~0.1 counts / 10 ms bin ~= 10 Hz population average
        fixTau=True,
        fixedTau=np.linspace(0.05, 0.5, xdim),
        seed=seed,
        # numpy backend: the benchmark data must be bit-identical between the
        # CPU reference-baseline process and the TPU bench process.
        backend="numpy",
    )
