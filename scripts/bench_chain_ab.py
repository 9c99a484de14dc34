"""Paired A/B: device-chained raw lane vs host-handoff, isolated requests.
Alternates modes ABBA within one process on the same runtime; reports p50s."""
import sys, time, tempfile
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from scripts.bench_serving import build_runtime, write_real_checkpoints, WORDS
from financial_rag_tpu.index.flat import FlatIndex

ckpt = tempfile.TemporaryDirectory()
write_real_checkpoints(Path(ckpt.name))
tmp = tempfile.TemporaryDirectory()
rt = build_runtime(tmp.name, False, 20000, seed=0)
rng = np.random.default_rng(7)
qs = [" ".join(rng.choice(WORDS, size=5)) + f" ab{i}" for i in range(40)]
FlatIndex.accepts_device_queries = True
rt.engine.query(qs[0]); rt.warm_sweeps()
FlatIndex.accepts_device_queries = False
rt.engine.query(qs[1]); FlatIndex.accepts_device_queries = True

lat = {True: [], False: []}
qi = 2
for rep in range(4):
    order = (True, False) if rep % 2 == 0 else (False, True)
    for chained in order:
        FlatIndex.accepts_device_queries = chained
        for _ in range(4):
            t0 = time.perf_counter()
            rt.engine.query(qs[qi]); qi += 1
            lat[chained].append((time.perf_counter() - t0) * 1000)
for m in (False, True):
    a = np.array(lat[m])
    print(f"chained={m}: n={len(a)} p50={np.median(a):.1f}ms mean={a.mean():.1f}ms")
print(f"isolated-request p50 speedup: {np.median(lat[False])/np.median(lat[True]):.3f}x")
