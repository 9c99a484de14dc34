"""IVF autotuner out-of-distribution robustness (VERDICT r4 #7).

The tuner picks nprobe from queries drawn near the corpus distribution
(perturbed stored vectors, or recorded production queries). This bench
measures what happens when SERVED queries shift away from what the tuner
saw: tune on the in-distribution sample, then evaluate recall@10 at the
tuned nprobe — and at the conservative default — on progressively shifted
query distributions:

  indist   : perturbations of corpus points at radius 0.35 (the tuner's
             own world — sanity row)
  wide     : perturbations at radius 0.60 (queries about the corpus's
             topics but phrased far off any stored exemplar)
  mixture  : queries around a DIFFERENT random cluster mixture (topic
             drift: the corpus stays, the query workload moves)
  uniform  : uniform random unit queries (worst case: no relation to the
             corpus geometry at all)

Recall is measured against the index's OWN exhaustive sweep per
distribution (nprobe = nlist), isolating the loss nprobe controls.

Writes an ``ood`` section into BENCH_SCALE.json (preserving existing
content) and prints one JSON line. The reference shipped pgvector IVFFlat
defaults with no measurement at all (reference
pgvector_child_store.py:92-98).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def on_sphere(v):
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="BENCH_SCALE.json")
    ap.add_argument("--cpu-smoke", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
        args.n = min(args.n, 8_192)

    from financial_rag_tpu.index.ivf import IVFIndex, recommended_nlist
    from financial_rag_tpu.models.encoder import setup_compilation_cache
    from financial_rag_tpu.utils.benchgen import clustered_corpus, on_sphere_noise

    setup_compilation_cache()
    n, d, nq, k = args.n, args.dim, args.queries, args.k
    rng = np.random.default_rng(7)
    x, q_indist = clustered_corpus(rng, n, d, nq)   # query_radius=0.35

    nlist = recommended_nlist(n)
    idx = IVFIndex(dim=d, nlist=nlist, list_size=max((n // nlist) * 2, 256),
                   nprobe=32, name="ood_ivf")
    idx.train(x[rng.choice(n, size=min(n, 65_536), replace=False)], iters=8)
    for lo in range(0, n, 65_536):
        hi = min(lo + 65_536, n)
        idx.upsert(np.arange(lo + 1, hi + 1, dtype=np.int64), x[lo:hi])

    # tune exactly the way production does: on in-distribution queries
    t0 = time.time()
    report = idx.tune_nprobe(k=k, target_recall=0.95, queries=q_indist)
    tuned = report["nprobe"]
    log(f"tuned nprobe={tuned} on in-distribution queries "
        f"({time.time() - t0:.1f}s, nlist={nlist})")

    # shifted query distributions over the SAME corpus
    qsrc = x[rng.choice(n, size=nq, replace=False)]
    new_centers = on_sphere(rng.standard_normal((max(n // 256, 64), d))
                            .astype(np.float32))
    dists = {
        "indist": q_indist,
        "wide": on_sphere_noise(rng, qsrc, 0.60),
        "mixture": on_sphere_noise(
            rng, new_centers[rng.integers(len(new_centers), size=nq)], 0.35),
        "uniform": on_sphere(rng.standard_normal((nq, d)).astype(np.float32)),
    }

    conservative = min(32, nlist)
    probes = sorted({tuned, conservative, min(tuned * 2, nlist)})
    rows = []
    for name, q in dists.items():
        q = on_sphere(np.asarray(q, np.float32))
        ex_ids, ex_s = idx.search(q, k, nprobe=nlist)   # per-dist ground truth
        row = {"distribution": name}
        for npb in probes:
            ids, s = idx.search(q, k, nprobe=npb)
            got = [set(int(c) for c, sc in zip(ri, rs) if np.isfinite(sc))
                   for ri, rs in zip(ids, s)]
            truth = [set(int(c) for c, sc in zip(ri, rs) if np.isfinite(sc))
                     for ri, rs in zip(ex_ids, ex_s)]
            rec = float(np.mean([len(g & t) / max(len(t), 1)
                                 for g, t in zip(got, truth)]))
            key = ("tuned" if npb == tuned else
                   "conservative" if npb == conservative else "tuned_x2")
            row[f"recall_{key}_nprobe{npb}"] = round(rec, 4)
            if name == "indist" and npb == tuned:
                base_recall = rec
        rows.append(row)
        log(f"{name:8s}: " + "  ".join(
            f"{kk.split('_nprobe')[0].replace('recall_', '')}"
            f"(np={kk.split('nprobe')[1]})={vv}"
            for kk, vv in row.items() if kk.startswith("recall")))

    # OOD gap at the tuned point and the safety-margin verdict: the tuner
    # targets 0.95 with +0.02 margin; the rule holds iff no shifted
    # distribution that still RELATES to the corpus (wide/mixture) falls
    # below the raw target. `uniform` is reported but not gated: queries
    # unrelated to every stored vector have no meaningful recall contract.
    gated = [r for r in rows if r["distribution"] in ("wide", "mixture")]
    worst = min(next(v for kk, v in r.items()
                     if kk.startswith("recall_tuned_")) for r in gated)
    ood_gap = round(base_recall - worst, 4)

    # the safety-margin rule (index/tuning.py ood_guard): what the guarded
    # tuner would apply, and its recall on the worst shifted distribution
    guarded = idx.tune_nprobe(k=k, target_recall=0.95, queries=q_indist,
                              ood_guard=True, apply=False)
    g_np = guarded["nprobe"]
    qm = on_sphere(np.asarray(dists["mixture"], np.float32))
    ex_ids, ex_s = idx.search(qm, k, nprobe=nlist)
    gids, gs = idx.search(qm, k, nprobe=g_np)
    truth = [set(int(c) for c, sc in zip(ri, rs) if np.isfinite(sc))
             for ri, rs in zip(ex_ids, ex_s)]
    got = [set(int(c) for c, sc in zip(ri, rs) if np.isfinite(sc))
           for ri, rs in zip(gids, gs)]
    g_rec = float(np.mean([len(g & t) / max(len(t), 1)
                           for g, t in zip(got, truth)]))
    log(f"ood guard: nprobe {tuned} -> {g_np}, mixture recall {g_rec:.4f}")

    section = {
        "n": n, "nlist": nlist, "tuned_nprobe": tuned,
        "target_recall": 0.95, "margin": 0.02,
        "indist_recall": round(base_recall, 4),
        "worst_related_ood_recall": round(worst, 4),
        "ood_gap": ood_gap,
        "ood_within_margin": bool(worst >= 0.95),
        "guarded_nprobe": g_np,
        "guarded_mixture_recall": round(g_rec, 4),
        "guard_detail": guarded.get("ood_guard"),
        "rows": rows,
        "backend": jax.default_backend(),
    }

    # BENCH_SCALE.json is JSON-LINES (one row per line); append the ood
    # section as one more row, replacing any previous ood row
    out = Path(args.out)
    lines = [l for l in out.read_text().splitlines()
             if l.strip()] if out.exists() else []
    lines = [l for l in lines
             if json.loads(l).get("metric") != "ivf_ood_robustness"]
    section = {"metric": "ivf_ood_robustness", **section}
    lines.append(json.dumps(section))
    out.write_text("\n".join(lines) + "\n")
    print(json.dumps({"metric": "ivf tuned-nprobe OOD recall gap "
                      f"(@{n // 1000}k, nlist={nlist}, tuned nprobe={tuned})",
                      "value": ood_gap, "unit": "recall_delta",
                      "ood_within_margin": section["ood_within_margin"],
                      "worst_related_ood_recall": section["worst_related_ood_recall"]}))


if __name__ == "__main__":
    main()
