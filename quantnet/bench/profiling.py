"""Tracing/profiling hooks: the reference had none (SURVEY.md section 5 —
timing was bare time.time() at utils/inference_benchmark.py:44-47 and CUDA
events at utils/result_analyzer.py:113-121). TPU-native equivalent: the JAX
profiler, with named trace annotations around pipeline stages so device
timelines attribute time to train/calibrate/eval/bench phases.

Usage:
    with trace("/tmp/quantnet_trace"):
        with annotate("eval:static"):
            run_eval(...)
    # inspect with tensorboard / xprof on the written trace
"""
from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device+host profile into `logdir` for the enclosed region."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline (host + device via XLA metadata)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace(logdir: Optional[str]) -> Iterator[None]:
    """trace() when a directory is given, no-op otherwise (CLI plumbing)."""
    if logdir:
        with trace(logdir):
            yield
    else:
        yield
