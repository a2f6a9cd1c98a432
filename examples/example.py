"""End-to-end example: synthetic data -> Poisson-PCA init -> batch EM ->
online EM -> plots.

The TPU-native twin of the reference's entry-point script
(``/root/reference/example.py``): same workflow and shapes, running as two
compiled EM programs.

Run:  python examples/example.py [--show]
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pgpfa

# dataset & fitting parameters (reference example.py:10-16)
xdim = 2
ydim = 20
num_trials = 5
trial_dur = 1000  # ms
bin_size = 20  # ms
max_em_iter = 100

training_set = pgpfa.dataset(
    seed=np.random.default_rng(123).integers(10000),
    xdim=xdim,
    ydim=ydim,
    numTrials=num_trials,
    trialDur=trial_dur,
    binSize=bin_size,
    dOffset=1,
    fixTau=True,
    fixedTau=np.linspace(0.1, 0.5, xdim),
    drawSameX=True,
    verbose=True,
)

init_params = pgpfa.initializeParams(xdim, ydim, training_set)

fit_batch = pgpfa.PPGPFAfit(
    experiment=training_set,
    initParams=init_params,
    inferenceMethod="laplace",
    EMmode="Batch",
    maxEMiter=max_em_iter,
    verbose=True,
)

fit_online = pgpfa.PPGPFAfit(
    experiment=training_set,
    initParams=init_params,
    EMmode="Online",
    maxEMiter=max_em_iter,
    inferenceMethod="laplace",
    batchSize=5,
    verbose=True,
)

print("\nbatch  tau:", fit_batch.optimParams["tau"], " (true:", training_set.params["tau"], ")")
print("online tau:", fit_online.optimParams["tau"])
print("batch  final nPLL: %.4f" % fit_batch.posteriorLikelihood[-1])
print("E-step time/iter: %.3fs, M-step time/iter: %.3fs"
      % (np.mean(fit_batch.inferenceTime[1:]), np.mean(fit_batch.learningTime[1:])))

training_set.plotTrajectory()
fit_batch.plotParamSeq()
fit_online.plotParamSeq()
fit_batch.plotTrajectory()
fit_online.plotTrajectory()

if "--show" in sys.argv:
    import matplotlib.pyplot as plt

    plt.show()
else:
    import matplotlib.pyplot as plt

    for i, num in enumerate(plt.get_fignums()):
        plt.figure(num).savefig(f"example_fig{i}.png")
    print(f"saved {len(plt.get_fignums())} figures (example_fig*.png)")
