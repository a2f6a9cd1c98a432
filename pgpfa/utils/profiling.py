"""Tracing / profiling helpers.

The reference's only instrumentation is wall-clock pairs around the E/M
phases (``funs/engine.py:151-152,182,217-218``), which :class:`PPGPFAfit`
preserves as ``inferenceTime``/``learningTime``. This module adds the
TPU-native layer: XLA profiler traces viewable in TensorBoard/Perfetto and a
lightweight phase timer.

Note (this environment): on the tunneled axon TPU, ``block_until_ready`` does
not reliably synchronize — force a scalar readback (``float(x.ravel()[0])``)
when timing, as :func:`phase_timer` does.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profiler trace for the enclosed block.

    View with TensorBoard (``tensorboard --logdir <logdir>``) or upload the
    ``.trace.json.gz`` to Perfetto.
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase with forced device sync."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync_on is not None:
                import numpy as np

                float(np.asarray(sync_on).ravel()[0])
            self.times.setdefault(name, []).append(time.time() - t0)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        return {k: float(np.mean(v)) for k, v in self.times.items()}
