"""The OOM-shaped-error predicate behind bench.py's conservative-remat
fallbacks must match all three observed failure shapes (native allocator,
PJRT message text, axon relay's opaque remote_compile wrapper) and no
ordinary errors — a false positive would silently mask real compile bugs
behind a slower retry."""

from mvuld_tpu.utils.oom import is_oom_shaped


def test_matches_observed_oom_shapes():
    observed = [
        # jax native allocator failure
        RuntimeError("RESOURCE_EXHAUSTED: Out of memory while trying to "
                     "allocate 17251893248 bytes."),
        # PJRT message text without the status code
        RuntimeError("XLA:TPU compile permanent error. Ran out of memory "
                     "in memory space hbm. Used 17.25G of 15.75G hbm."),
        # the axon relay wraps compile-time OOM as an opaque HTTP 500
        # (runs/r4s4: the 'Ran out of memory' text stays in relay stderr)
        RuntimeError("INTERNAL: remote_compile: HTTP 500"),
    ]
    for exc in observed:
        assert is_oom_shaped(exc), exc


def test_rejects_ordinary_errors():
    for exc in [
        ValueError("flat window attention: N=783 is not a square"),
        TypeError("unsupported operand type(s)"),
        RuntimeError("INVALID_ARGUMENT: computation requires more "
                     "parameters (3) than supplied (2)"),
        KeyError("params"),
    ]:
        assert not is_oom_shaped(exc), exc
