"""jax.profiler integration (SURVEY.md §5.1 'TPU equivalent': profiler
traces + per-stage timing). TimingLogger already annotates stages via
TraceAnnotation; this adds whole-window trace capture for perfetto/XProf."""

from __future__ import annotations

import contextlib
from pathlib import Path

from financial_rag_tpu.utils.logging import get_logger

log = get_logger("utils.profiling")


@contextlib.contextmanager
def profile_trace(out_dir: str | Path = "profiles"):
    """Capture a jax.profiler trace around a code block.

    View with xprof/tensorboard or perfetto. The TimingLogger stage labels
    (encoder.forward_*, hybrid.search, rerank.forward_*, ...) appear as
    TraceMe annotations inside the capture.
    """
    import jax.profiler

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(out))
    try:
        yield out
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", out)
