"""Concurrent search/upsert/delete stress on the REAL chip.

Donation-based in-place index updates invalidate the old storage buffer,
so this race is only observable where donation is active (TPU; the CPU
test mesh ignores donation) — the index locks serialize fn-selection and
dispatch against mutation. Verified on v5e: 2 searcher + 1 upserter +
1 deleter threads for 20s per index class, zero errors.
Run: PYTHONPATH=.:/root/.axon_site python scripts/stress_donation.py
"""
import threading, time, numpy as np, sys
sys.path.insert(0, "/root/repo")
from financial_rag_tpu.index.flat import FlatIndex
from financial_rag_tpu.index.ivf import IVFIndex

rng = np.random.default_rng(0)
d, n = 384, 50_000
x = rng.standard_normal((n, d)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
ids = np.arange(1, n + 1, dtype=np.int64)

for make in (lambda: FlatIndex(dim=d, capacity=65536),
             lambda: IVFIndex(dim=d, nlist=64, list_size=2048, nprobe=8)):
    idx = make()
    if isinstance(idx, IVFIndex):
        idx.train(x[:20000], iters=4)
    idx.upsert(ids[:20000], x[:20000])
    errors = []
    stop = threading.Event()

    def searcher():
        q = x[:16]
        while not stop.is_set():
            try:
                got, s = idx.search(q, 10)
                assert got.shape == (16, 10)
            except Exception as e:
                errors.append(("search", repr(e))); break

    def upserter():
        lo = 20000
        while not stop.is_set() and lo < n:
            try:
                idx.upsert(ids[lo:lo+512], x[lo:lo+512])
                lo += 512
            except Exception as e:
                errors.append(("upsert", repr(e))); break

    def deleter():
        k = 0
        while not stop.is_set() and k < 5000:
            try:
                idx.delete(ids[k:k+64]); k += 64
            except Exception as e:
                errors.append(("delete", repr(e))); break

    threads = [threading.Thread(target=f) for f in (searcher, searcher, upserter, deleter)]
    for t in threads: t.start()
    time.sleep(20); stop.set()
    for t in threads: t.join(timeout=30)
    print(type(idx).__name__, "errors:", errors[:3] if errors else "NONE",
          "count:", idx.count(), flush=True)
    assert not errors, errors
print("stress OK")
