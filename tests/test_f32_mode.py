"""The advertised f32 fast mode (``PGPFA_X64=0``) actually fits — on EVERY
advertised path, not just batch Laplace (VERDICT r3 item 4).

x64 is a process-global jax flag, so each f32 run happens in a subprocess;
every configuration is run in BOTH dtypes and the f32 trajectory is pinned to
the f64 one within a stated envelope. Measured envelopes (documented in
README): nPLL tracks the f64 trajectory at ~5e-2 absolute (~2e-4 relative);
tau at ~2e-3 s. The 1e-6 oracle-parity target requires the default f64 mode.

Covered paths and their mode-specific machinery:
* batch Laplace        — Newton stall cutoff (``infer/laplace.py``)
* batch variational    — chunked L-BFGS stall slack (``utils/optim.py``)
* online 'diag' / 'fullyUpdateAll' — acceptance slack (``learn/mstep_obs.py``)
* banded Laplace (``time_block``) — refinement gating (``ops/blockmat.py``)
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r'''
import os, json
os.environ["PGPFA_X64"] = "{flag}"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import pgpfa

mode = {mode!r}
# banded path needs block_span * bin >= 6 * max(tau): taus <= 80 ms vs
# 25 bins * 20 ms = 500 ms
taus = np.array([0.05, 0.08]) if mode == "banded" else np.linspace(0.1, 0.5, 2)
train = pgpfa.dataset(xdim=2, ydim=20, numTrials=5, trialDur=1000, binSize=20,
                      dOffset=1, fixTau=True, fixedTau=taus,
                      seed=123, backend="numpy")
init = pgpfa.initializeParams(2, 20, train, seed=0)
if mode == "laplace":
    cfg = pgpfa.FitConfig(max_em_iter=5)
elif mode == "variational":
    cfg = pgpfa.FitConfig(inference_method="variational", max_em_iter=5)
elif mode == "banded":
    cfg = pgpfa.FitConfig(max_em_iter=4, time_block=25)
else:  # online rules: identical injected minibatch stream in both dtypes
    cfg = pgpfa.FitConfig(em_mode="online", online_update=mode, batch_size=3,
                          max_em_iter=5)
kw = {{}}
if mode in ("diag", "fullyUpdateAll"):
    kw["batch_indices"] = [np.array([0, 1, 2]), np.array([2, 3, 4]),
                           np.array([1, 3, 0]), np.array([4, 0, 2]),
                           np.array([3, 1, 4])]
res = pgpfa.fit_loop(init, train.Y, 20.0, cfg, **kw)
out = {{"pll": [float(v) for v in np.asarray(res.post_loglik)],
        "tau": [float(v) for v in np.asarray(res.tau)],
        "dtype": str(res.C.dtype)}}
if mode == "variational":
    out["vlb"] = [float(v) for v in np.asarray(res.var_lower_bound)]
print(json.dumps(out))
'''


def _run(flag, mode):
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(flag=flag, mode=mode)],
        capture_output=True, text=True, cwd=REPO, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def _check_pair(mode, pll_atol=6e-2, tau_atol=5e-3, monotone=True):
    f64 = _run("1", mode)
    f32 = _run("0", mode)
    assert f32["dtype"] == "float32"
    pll32, pll64 = np.asarray(f32["pll"]), np.asarray(f64["pll"])
    assert np.isfinite(pll32).all()
    if monotone:
        assert np.all(np.diff(pll32) > -1e-3), "f32 EM must improve monotonically"
    np.testing.assert_allclose(pll32, pll64, rtol=0, atol=pll_atol)
    np.testing.assert_allclose(f32["tau"], f64["tau"], atol=tau_atol)
    return f32, f64


def test_f32_mode_fits_and_tracks_f64():
    _check_pair("laplace")


def test_f32_variational_tracks_f64():
    f32, f64 = _check_pair("variational")
    vlb32, vlb64 = np.asarray(f32["vlb"]), np.asarray(f64["vlb"])
    assert np.isfinite(vlb32).all()
    assert np.all(np.diff(vlb32) > -1e-3), "f32 VLB must improve monotonically"
    np.testing.assert_allclose(vlb32, vlb64, rtol=0, atol=6e-2)


@pytest.mark.parametrize("rule", ["diag", "fullyUpdateAll"])
def test_f32_online_rules_track_f64(rule):
    # online minibatch trajectories amplify rounding differences faster than
    # batch EM (no monotonicity guarantee either — the reference's online
    # nPLL is evaluated on CHANGING minibatches): envelope only
    _check_pair(rule, pll_atol=0.3, tau_atol=2e-2, monotone=False)


def test_f32_banded_path_tracks_f64():
    _check_pair("banded")
