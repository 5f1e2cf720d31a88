"""Profiler tracing helpers — the NVTX/nsys-equivalent tooling.

The reference instruments with ``torch.cuda.nvtx`` ranges + nsys
(``reranker_hf/advanced_rag.py:217-279``) and FPGA ``xrt.ini`` profiling
(``connectivity.cfg:15-17``).  TPU-native equivalent: ``jax.profiler``
traces viewable in Perfetto/TensorBoard, plus the ``TraceAnnotation``
ranges already emitted by ``chamjax.rag.StageTimer`` and available here as
``annotate``.

    with trace("/tmp/chamjax_trace"):
        searcher.search(q)          # open /tmp/chamjax_trace in Perfetto

    with annotate("adc_scan"):
        ...
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device+host profile into ``log_dir``."""
    import jax.profiler
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range visible in the trace timeline (nvtx.range parity)."""
    import jax.profiler
    return jax.profiler.TraceAnnotation(name)


def device_memory_profile(path: str) -> None:
    """Dump a device memory profile (pprof format)."""
    import jax.profiler
    jax.profiler.save_device_memory_profile(path)
