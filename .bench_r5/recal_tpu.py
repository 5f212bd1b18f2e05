"""Reddit accuracy-protocol calibration grid on the TPU (one process).

Finds (p_intra, feat_snr) putting the relu CONTROL in the 0.3-0.95
discriminative band at the ksweep protocol (scale 0.1, 500ep final; the
grid probes 200ep — relu plateaus early), then sanity-checks that maxk
arms spread BELOW the control.
"""
import sys, time
import numpy as np
from maxk_tpu.data.datasets import load_dataset
from maxk_tpu.train.config import TrainConfig
from maxk_tpu.train.loop import train

def run(p_intra, snr, arm, epochs=200):
    data = load_dataset("reddit", scale=0.1, seed=123, feat_snr=snr,
                        graph_kind="sbm", sbm_p_intra=p_intra)
    nonlinear, k = ("relu", 256) if arm == "relu" else ("maxk", int(arm.split("k")[1]))
    cfg = TrainConfig(dataset="reddit", model="sage", epochs=epochs, lr=0.001,
                      hidden_dim=256, hidden_layers=3, nonlinear=nonlinear,
                      maxk=k, seed=97, data_scale=0.1, kernel_mode="auto",
                      feat_snr=snr)
    t0 = time.time()
    st = train(cfg, data, logger=None, writer=None)
    print(f"GRID p_intra={p_intra} snr={snr} {arm}: val={st.best_val:.4f} "
          f"test={st.best_test:.4f} ({time.time()-t0:.0f}s)", flush=True)
    return st.best_val

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.maxk_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

candidates = [(0.3, 0.05), (0.15, 0.05), (0.08, 0.05), (0.15, 0.02)]
best = None
for p, s in candidates:
    v = run(p, s, "relu")
    if 0.35 <= v <= 0.9 and best is None:
        best = (p, s, v)
if best:
    p, s, v = best
    print(f"CHOSEN p_intra={p} snr={s} relu_val={v}", flush=True)
    for arm in ("maxk_k8", "maxk_k64"):
        run(p, s, arm)
else:
    print("NO CANDIDATE IN BAND", flush=True)
