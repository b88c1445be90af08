"""OOM-shaped error detection for conservative-fallback paths.

The axon TPU relay wraps a compile-time HBM OOM as an opaque
``INTERNAL: ... remote_compile ... HTTP 500`` (the "Ran out of memory"
text stays in the relay's stderr, not in the raised exception), so any
fallback that only matches jax's native ``RESOURCE_EXHAUSTED`` misses
relay-wrapped OOMs. bench.py's swin/e2e stages retry with conservative
remat when this predicate matches; a genuinely broken program fails the
retry too and raises from there.
"""

from __future__ import annotations

_OOM_MARKERS = (
    "RESOURCE_EXHAUSTED",      # jax/XLA native allocator failure
    "Ran out of memory",       # PJRT allocator message text
    "remote_compile",          # axon relay's opaque HTTP-500 wrapper
)


def is_oom_shaped(exc: BaseException) -> bool:
    """True when ``exc`` plausibly signals device/compile memory exhaustion
    (including the relay-wrapped form) and a less memory-hungry retry is
    worth attempting."""
    text = str(exc)
    return any(marker in text for marker in _OOM_MARKERS)
