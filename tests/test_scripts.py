"""Smoke tests for the operational CLI scripts (subprocess, CPU backend)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(script, args, cwd):
    env = dict(os.environ)
    env["FRAG_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=300)


@pytest.mark.slow
def test_ingest_check_fullflow_chain(tmp_path):
    docs = tmp_path / "New folder"
    docs.mkdir()
    (docs / "lease.json").write_text(json.dumps({"blocks": [
        {"content": "The rent for the second year is Rs 42,800 per month. "
                    "The lock-in period is 36 months. " * 6, "page": 0}]}))

    r = _run("ingest_all.py", ["--dir", "New folder", "--data-dir", "."], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ingested 1 documents" in r.stdout
    assert "parents.db: 1 parents" in r.stdout

    r2 = _run("check_collections.py", ["--data-dir", "."], tmp_path)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "parents.db: 1 parents" in r2.stdout

    r3 = _run("test_full_flow.py",
              ["--data-dir", ".", "--questions", "What is the rent for the second year?"],
              tmp_path)
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert "42,800" in r3.stdout
    logs = list((tmp_path / "test_logs").glob("fullflow_*.json"))
    assert logs
    payload = json.loads(logs[0].read_text())
    assert payload["token_accounting"]["prompt_tokens"] > 0

    r4 = _run("pc_retrieval_smoke.py",
              ["--data-dir", ".", "--queries", "rent second year"], tmp_path)
    assert r4.returncode == 0, r4.stderr[-2000:]
    assert "parent" in r4.stdout


@pytest.mark.slow
def test_bench_suite_cpu_smoke(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import sys; sys.argv = ['bench_suite', '--scales', '2048', '--iters', '2',\n"
        "                        '--batch', '8', '--oracle-sample', '4']\n"
        f"import runpy; runpy.run_path('{REPO}/scripts/bench_suite.py', run_name='__main__')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=tmp_path, env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(line) for line in r.stdout.splitlines() if line.startswith("{")]
    assert rows and all(row["recall_at_k"] >= 0.99 for row in rows)


@pytest.mark.slow
def test_bench_e2e_answer_cpu_smoke(tmp_path):
    """Full streaming answer path (retrieve -> rerank -> local LLM -> SSE)
    must produce all four rows with a real answer_partial phase."""
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env["FRAG_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, f"{REPO}/scripts/bench_e2e_answer.py", "--small",
         "--chunks", "64", "--reps", "2", "--max-new", "8",
         "--out", str(tmp_path / "rows.json")],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(line) for line in r.stdout.splitlines()
            if line.startswith("{")]
    assert len(rows) == 4 and all(row["value"] > 0 for row in rows)
    ttfa = next(row for row in rows if "first-answer-tokens" in row["metric"])
    total = next(row for row in rows if "complete" in row["metric"])
    assert ttfa["value"] <= total["value"]


@pytest.mark.slow
def test_run_end_to_end_script(tmp_path):
    src = tmp_path / "input"
    src.mkdir()
    (src / "doc.json").write_text(json.dumps({"blocks": [
        {"content": "The total invoice amount is Rs 1,18,000 including GST. " * 8,
         "page": 0}]}))
    r = _run("run_end_to_end.py",
             ["--input", "input", "--data-dir", ".",
              "--smoke-query", "total invoice amount"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "1 parents" in r.stdout or "parents" in r.stdout
    assert "retrieval smoke" in r.stdout
    assert "1,18,000" in r.stdout or "child" in r.stdout
