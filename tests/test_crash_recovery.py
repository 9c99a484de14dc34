"""Crash-recovery e2e across a REAL process boundary (VERDICT r3 #5b).

The durability invariants — checkpoint-before-ledger ordering, idempotent
re-ingest by purge, persisted purge obligations — are unit-tested in
test_robustness.py / test_ingest.py, but a unit test cannot prove them
against an actual dead process. Here a subprocess ingests documents and is
SIGKILLed at the two interesting instants:

- BEFORE the index checkpoint (vectors existed only in the dead process,
  ledger never saved) — restart must re-process everything;
- AFTER the index checkpoint but BEFORE the ledger save (vectors durable,
  ledger stale) — restart re-processes the same docs and the purge-first
  idempotent re-ingest must converge with no lost or duplicated children.

Reference counterpart: the reference's resume story is the processing
ledger alone (reference api_server.py:67-134,339-364); Chroma persisted
implicitly so it never faced the index/ledger ordering problem this
framework's explicit checkpoints create.
"""

import json
import os
import signal
import subprocess
import sys
import textwrap

import pytest

DRIVER = textwrap.dedent("""
    import os, signal, sys

    os.environ["FRAG_PLATFORM"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"

    from financial_rag_tpu.config import FrameworkConfig
    from financial_rag_tpu.runtime import Runtime

    data_dir, kill_point = sys.argv[1], sys.argv[2]
    rt = Runtime.build(FrameworkConfig.from_env(), data_dir=data_dir)
    proc = rt.make_processor(data_dir)
    orig = proc.on_sweep_complete
    if kill_point == "before_checkpoint":
        proc.on_sweep_complete = lambda: os.kill(os.getpid(), signal.SIGKILL)
    elif kill_point == "after_checkpoint":
        def after():
            orig()
            os.kill(os.getpid(), signal.SIGKILL)
        proc.on_sweep_complete = after
    out = proc.process_all()
    print("SWEEP_DONE", len(out["processed"]), len(out["failed"]), flush=True)
""")

DOCS = {
    "lease": "The rent for the second year is Rs 42,800 per month. "
             "The lock-in period is 36 months. " * 6,
    "invoice": "Tax Invoice INV-42: total amount Rs 1,18,000. "
               "GST amount Rs 18,000 at 18 percent. " * 6,
}


def _run_driver(data_dir, kill_point):
    env = dict(os.environ, PYTHONPATH="/root/repo",
               FRAG_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)   # single-device CPU is enough and faster
    return subprocess.run(
        [sys.executable, str(data_dir / "driver.py"), str(data_dir), kill_point],
        capture_output=True, text=True, timeout=300, env=env)


def _setup(tmp_path):
    src = tmp_path / "Source_Documents"
    src.mkdir()
    for doc_id, text in DOCS.items():
        (src / f"{doc_id}.json").write_text(
            json.dumps({"blocks": [{"content": text, "page": 0}]}))
    (tmp_path / "driver.py").write_text(DRIVER)
    return src


def _verify_recovered(tmp_path):
    """Fresh in-process runtime over the same data dir: the recovered state
    must be complete, consistent, and duplicate-free."""
    from financial_rag_tpu.config import FrameworkConfig
    from financial_rag_tpu.runtime import Runtime

    rt = Runtime.build(FrameworkConfig.from_env(), data_dir=tmp_path)
    # every index holds exactly the children the metadata store knows
    n_meta = rt.child_meta.count()
    assert n_meta > 0
    for name, idx in rt.indexes.items():
        assert idx.count() == n_meta, (name, idx.count(), n_meta)
    # no duplicated children per document: each doc's children are unique
    # and every child id is searchable exactly once
    for doc_id in DOCS:
        kids = rt.child_meta.children_of_document(doc_id)
        assert kids, f"{doc_id} lost its children"
        assert len(kids) == len(set(kids))
    # ledger agrees the work is done
    summ = rt.ledger.summary()
    assert summ["total"] == len(DOCS) and summ["embedded"] == len(DOCS)
    assert summ["errors"] == 0
    # and the content actually answers
    res = rt.engine.query("What is the rent for the second year?")
    assert res["success"] and "42,800" in res["answer"]
    return rt


@pytest.mark.parametrize("kill_point", ["before_checkpoint", "after_checkpoint"])
def test_sigkill_mid_ingest_then_restart_converges(tmp_path, kill_point):
    _setup(tmp_path)

    killed = _run_driver(tmp_path, kill_point)
    assert killed.returncode == -signal.SIGKILL, (
        killed.returncode, killed.stdout[-500:], killed.stderr[-1500:])
    assert "SWEEP_DONE" not in killed.stdout

    if kill_point == "after_checkpoint":
        # the checkpoint landed before death: vectors are on disk...
        persist = tmp_path / ".tpu_index"
        assert any(persist.glob("*.npz")), "checkpoint missing"
        # ...but the ledger must NOT claim the docs are embedded (save
        # runs after the checkpoint hook and the process died first)
        state = tmp_path / ".processing_state.json"
        if state.exists():
            raw = json.loads(state.read_text())
            states = raw.get("states", raw)
            assert not any(v.get("embedded") for v in states.values()
                           if isinstance(v, dict) and "embedded" in v)

    # restart: a fresh process completes the sweep cleanly
    recovered = _run_driver(tmp_path, "none")
    assert recovered.returncode == 0, recovered.stderr[-1500:]
    assert "SWEEP_DONE 2 0" in recovered.stdout

    _verify_recovered(tmp_path)

    # a further restart + sweep is a no-op (idempotence reached a fixpoint)
    again = _run_driver(tmp_path, "none")
    assert "SWEEP_DONE 0 0" in again.stdout, again.stdout


def test_sigkill_after_source_deletion_checkpoint(tmp_path):
    """Deletion-heavy crash: the source disappears, the purge sweep is
    killed BEFORE its checkpoint — the persisted purge tombstone must make
    the restart re-purge the ghost vectors the stale checkpoint resurrects."""
    src = _setup(tmp_path)

    clean = _run_driver(tmp_path, "none")
    assert clean.returncode == 0 and "SWEEP_DONE 2 0" in clean.stdout

    (src / "invoice.json").unlink()
    killed = _run_driver(tmp_path, "before_checkpoint")
    assert killed.returncode == -signal.SIGKILL

    recovered = _run_driver(tmp_path, "none")
    assert recovered.returncode == 0, recovered.stderr[-1500:]

    from financial_rag_tpu.config import FrameworkConfig
    from financial_rag_tpu.runtime import Runtime

    rt = Runtime.build(FrameworkConfig.from_env(), data_dir=tmp_path)
    assert rt.child_meta.children_of_document("lease")
    assert not rt.child_meta.children_of_document("invoice")
    n_meta = rt.child_meta.count()
    for name, idx in rt.indexes.items():
        assert idx.count() == n_meta, (name, idx.count(), n_meta)
    # no lingering purge obligation
    assert rt.ledger.purge_tombstones() == []
