"""REAL multi-process multi-host test (VERDICT r4 item 6).

Launches two OS processes under ``jax.distributed.initialize`` (gloo CPU
collectives, 4 virtual devices each -> one 8-device global mesh), each
holding only its local half of the trials, and asserts the assembled
:func:`pgpfa.parallel.distributed.fit_multihost` result matches the
single-process :func:`fit_sharded` on the same data — so the multi-host
path's array assembly (``make_array_from_process_local_data``) and
cross-process collectives are exercised across an actual process boundary,
not just reduced to the single-process fallback.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import pgpfa
from pgpfa.em.fit import FitConfig
from pgpfa.parallel.sharded import fit_sharded

_WORKER = """
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["PGPFA_X64"] = "1"
os.environ["PGPFA_COMPILE_CACHE"] = "0"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4
import numpy as np
import pgpfa
from pgpfa.em.fit import FitConfig
from pgpfa.parallel.distributed import fit_multihost
from pgpfa.parallel.mesh import make_mesh

train = pgpfa.dataset(xdim=2, ydim=16, numTrials=16, trialDur=600, binSize=20,
                      dOffset=0.5, fixTau=True, fixedTau=np.array([0.15, 0.3]),
                      seed=4)
init = pgpfa.initializeParams(2, 16, train, seed=0)
Y_local = np.asarray(train.Y)[8 * pid: 8 * (pid + 1)]
cfg = FitConfig(max_em_iter=3)
res = fit_multihost(init, Y_local, 20.0, cfg, mesh=make_mesh())
if pid == 0:
    np.savez(out,
             post_loglik=np.asarray(res.post_loglik),
             C=np.asarray(res.C), tau=np.asarray(res.tau))
print("WORKER_OK", pid)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_fit_multihost_matches_fit_sharded(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = tmp_path / "result.npz"
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    # the worker runs as a script from tmp_path: python puts the SCRIPT's
    # directory on sys.path, not the cwd, so the repo must ride PYTHONPATH
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), str(port),
                          str(out)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=1100)
        outs.append((p.returncode, so, se))
    for rc, so, se in outs:
        assert rc == 0, f"worker failed ({rc}):\n{se[-1500:]}"
        assert "WORKER_OK" in so

    # single-process reference on the identical data/init
    train = pgpfa.dataset(xdim=2, ydim=16, numTrials=16, trialDur=600,
                          binSize=20, dOffset=0.5, fixTau=True,
                          fixedTau=np.array([0.15, 0.3]), seed=4)
    init = pgpfa.initializeParams(2, 16, train, seed=0)
    ref = fit_sharded(init, train.Y, 20.0, FitConfig(max_em_iter=3))

    got = np.load(out)
    # the 2-process run is a different XLA program (gloo cross-process
    # collectives vs in-process all-reduce) so reductions may reassociate;
    # same tolerances as the single-vs-sharded test above this scale
    np.testing.assert_allclose(got["post_loglik"],
                               np.asarray(ref.post_loglik), rtol=1e-9)
    np.testing.assert_allclose(got["C"], np.asarray(ref.C), atol=1e-7)
    np.testing.assert_allclose(got["tau"], np.asarray(ref.tau), atol=1e-8)
