"""Tracing / profiling: per-stage wall-clock and genes/sec counters.

The reference has no built-in profiling — progress is message() narration
(R/core.R:387-394) and timing lives only in an offline harness
(inst/script/testsuite.Rmd:55-60).  For a TPU pipeline, per-stage timers
and genes/s throughput are first-class observability (SURVEY.md section
5): every orchestration stage records into a global registry, and
``trace()`` wraps ``jax.profiler.trace`` for on-device timelines viewable
in Perfetto/TensorBoard.

Usage::

    import deseq2_tpu as dt
    dt.profiling.enable()
    dds = dt.deseq(dt.make_example_dataset(n=60000, m=128))
    print(dt.profiling.report())      # table: stage, seconds, genes/s
    for rec in dt.profiling.records(): ...

    with dt.profiling.trace("/tmp/jax-trace"):   # device timeline
        dds = dt.deseq(dds)
"""

from __future__ import annotations

import contextlib
import os
import time

__all__ = ["enable", "disable", "enabled", "stage", "records", "report",
           "reset", "trace"]

_records: list = []
_enabled = os.environ.get("DESEQ2_TPU_PROFILE", "0") not in ("0", "", "false")
_depth = 0


def enable():
    """Turn on stage timing (also: env DESEQ2_TPU_PROFILE=1)."""
    global _enabled
    _enabled = True


def disable():
    global _enabled
    _enabled = False


def enabled():
    return _enabled


def reset():
    _records.clear()


def records():
    """List of dicts: stage, seconds, genes, genes_per_sec, depth, t_start."""
    return list(_records)


@contextlib.contextmanager
def stage(name, genes=None):
    """Time a pipeline stage; no-op when profiling is disabled.

    Note: JAX dispatch is async — callers that want device time to be
    attributed to the stage must block on outputs inside the context
    (the orchestration layer converts results to numpy, which blocks).
    """
    global _depth
    if not _enabled:
        yield
        return
    _depth += 1
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _depth -= 1
        _records.append({
            "stage": name,
            "seconds": dt,
            "genes": genes,
            "genes_per_sec": (genes / dt) if genes and dt > 0 else None,
            "depth": _depth,
            "t_start": t0,
        })


def record(name, seconds, genes=None):
    """Append a pre-timed record (for spans that don't nest cleanly)."""
    if not _enabled:
        return
    _records.append({
        "stage": name, "seconds": seconds, "genes": genes,
        "genes_per_sec": (genes / seconds) if genes and seconds > 0 else None,
        "depth": _depth, "t_start": time.perf_counter() - seconds,
    })


def report():
    """Human-readable per-stage timing table (most recent run order)."""
    if not _records:
        return "(no profiling records; call deseq2_tpu.profiling.enable())"
    lines = [f"{'stage':<42} {'seconds':>9} {'genes/s':>12}"]
    for r in _records:
        gps = f"{r['genes_per_sec']:,.0f}" if r["genes_per_sec"] else ""
        lines.append(f"{'  ' * r['depth']}{r['stage']:<42} "
                     f"{r['seconds']:>9.3f} {gps:>12}")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir, create_perfetto_link=False):
    """On-device profiler trace (XLA/TPU timeline) around a block."""
    import jax

    with jax.profiler.trace(str(log_dir),
                            create_perfetto_link=create_perfetto_link):
        yield
