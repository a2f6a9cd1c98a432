"""Subprocess-isolated fit driver: failure recovery for a wedging accelerator.

The reference runs everything in one Python process and its only recovery
mechanism is warm starts (SURVEY.md §5 "failure detection / elastic
recovery"). This environment has exactly one REAL failure mode: the tunneled
TPU's worker can wedge (hang without an error) after many dispatches of a
large program in one process — observed with the Stevenson-shaped dual
variational solve, where a single process reliably completes one full EM
iteration but not a multi-iteration fit. :func:`fit_isolated` productizes the
recovery story that ``bench.py`` previously hand-rolled:

* the fit is split into SEGMENTS of ``iters_per_segment`` EM iterations;
* each segment runs :func:`pgpfa.em.fit.fit_loop` in a FRESH subprocess,
  resuming from the previous segment's full-state checkpoint (params,
  warm-start modes, online prior state, RNG stream, recorded histories —
  resume is bit-exact, pinned by tests/test_aux.py);
* a segment that crashes or hangs past ``timeout`` is killed and retried —
  checkpoints are written atomically every iteration inside a segment, so a
  retry resumes from the last COMPLETED iteration, not the segment start;
* the final segment serializes the full :class:`FitResult` for the parent.

A wedged worker therefore costs one segment's progress, not the fit. The
same driver doubles as a generic preemption-tolerant runner (kill the
process at any point; rerun the same call; it resumes).
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import tempfile
from typing import Optional

import numpy as np

from pgpfa.em.fit import FitConfig, FitResult

_JOB = "job.npz"
_CFG = "config.json"
_CKPT = "ckpt.npz"
_RESULT = "result.npz"


def fit_isolated(
    init_params,
    Y,
    bin_size_ms: float,
    config: Optional[FitConfig] = None,
    seed: int = 0,
    iters_per_segment: int = 1,
    workdir: Optional[str] = None,
    timeout: float = 3600.0,
    retries: int = 1,
    python: Optional[str] = None,
    verbose: bool = False,
) -> FitResult:
    """Run a host-loop fit as a chain of subprocess segments (see module doc).

    Numerically identical to ``fit_loop(init_params, Y, bin_size_ms, config)``
    (bit-exact resume chain; tested). Args beyond ``fit_loop``'s:

    Args:
        iters_per_segment: EM iterations per subprocess (1 = a fresh worker
            every iteration — the safe setting for a wedging accelerator).
        workdir: directory for the job/checkpoint/result files (kept for
            post-mortems when given; a temp dir otherwise).
        timeout: per-segment wall-clock limit in seconds — the wedge detector.
        retries: extra attempts per segment after a crash/hang.
        verbose: stream subprocess output instead of capturing it.
    """
    cfg = config or FitConfig()
    workdir = workdir or tempfile.mkdtemp(prefix="pgpfa_isolated_")
    os.makedirs(workdir, exist_ok=True)
    init = {k: np.asarray(init_params[k]) for k in ("C", "d", "tau")}
    np.savez(
        os.path.join(workdir, _JOB),
        Y=np.asarray(Y),
        bin_size_ms=np.asarray(float(bin_size_ms)),
        seed=np.asarray(int(seed)),
        **init,
    )
    with open(os.path.join(workdir, _CFG), "w") as f:
        json.dump(dataclasses.asdict(cfg), f)

    python = python or sys.executable
    # the worker must import pgpfa regardless of the caller's cwd: put this
    # package's parent directory on the subprocess PYTHONPATH (found via the
    # live module, so source checkouts and installs both work)
    import pgpfa as _pkg

    env = dict(os.environ)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    total = cfg.max_em_iter
    seg_ends = list(range(iters_per_segment, total, iters_per_segment)) + [total]
    for seg_end in seg_ends:
        attempt = 0
        while True:
            try:
                r = subprocess.run(
                    [python, "-m", "pgpfa.em.isolated", workdir, str(seg_end)],
                    capture_output=not verbose,
                    text=True,
                    timeout=timeout,
                    env=env,
                )
                err = (
                    None
                    if r.returncode == 0
                    else f"exit code {r.returncode}: {(r.stderr or '')[-400:]}"
                )
            except subprocess.TimeoutExpired:
                err = f"segment hang: no completion within {timeout}s (wedged worker?)"
            if err is None:
                break
            attempt += 1
            if attempt > retries:
                raise RuntimeError(
                    f"fit_isolated segment ending at EM iteration {seg_end} "
                    f"failed after {retries + 1} attempts — {err}; state for "
                    f"manual resume is in {workdir}"
                )

    blob = np.load(os.path.join(workdir, _RESULT))
    # optional fields (e.g. iter_sec) are omitted from the blob when None
    return FitResult(**{k: blob[k] for k in FitResult._fields if k in blob})


def _worker(workdir: str, stop_after: int) -> None:
    """Subprocess entry: run one segment, checkpointing every iteration."""
    # Pin the platform from the environment BEFORE pgpfa touches jax.config
    # (the env var is ignored once any config update lands — CLAUDE.md rule 1);
    # without an env var the default device (TPU when present) is used.
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from pgpfa.em.fit import FitConfig, fit_loop

    job = np.load(os.path.join(workdir, _JOB))
    with open(os.path.join(workdir, _CFG)) as f:
        cfg = FitConfig(**json.load(f))
    ckpt = os.path.join(workdir, _CKPT)
    res = fit_loop(
        {"C": job["C"], "d": job["d"], "tau": job["tau"]},
        job["Y"],
        float(job["bin_size_ms"]),
        cfg,
        seed=int(job["seed"]),
        checkpoint_path=ckpt,
        checkpoint_every=1,
        resume_from=ckpt if os.path.exists(ckpt) else None,
        stop_after=stop_after,
    )
    if stop_after >= cfg.max_em_iter:
        out = {k: np.asarray(getattr(res, k)) for k in FitResult._fields
               if getattr(res, k) is not None}
        tmp = os.path.join(workdir, _RESULT + ".tmp.npz")
        np.savez(tmp, **out)
        os.replace(tmp, os.path.join(workdir, _RESULT))


if __name__ == "__main__":
    _worker(sys.argv[1], int(sys.argv[2]))
