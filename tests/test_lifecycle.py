"""Full multichip dryrun lifecycle on the 8-device CPU mesh.

Drives ``__graft_entry__._dryrun_impl`` — the exact code path the driver's
``dryrun_multichip`` validates — including the round-4 checkpoint lifecycle:
three sharded optimizer steps, orbax save of the sharded TrainState, restore
into a fresh mesh, one resumed step with bit-level loss continuity, and a
sharded eval/metric gather (reference resume semantics: mvuld/utils.py:143-211,
validate loop mvuld/main.py:358-426) — plus the expert-parallel Swin-MoE step
(experts over "mp"), the pipelined text-encoder fwd+bwd (parallel/pipeline.py
gpipe over "mp"), and the end-to-end tri-modal step (batch over "dp",
gradients asserted to move all three encoder towers).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_dryrun_lifecycle(capsys):
    import __graft_entry__ as g
    g._dryrun_impl(8)
    out = capsys.readouterr().out
    assert "ok" in out
    assert "resume-verified" in out
    assert "step=4" in out
    assert "moe-ep loss=" in out and "moe-ep loss=nan" not in out
    assert "pp loss=" in out and "pp loss=nan" not in out
    assert "e2e loss=" in out and "e2e loss=nan" not in out
