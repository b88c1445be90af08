"""Measure the REFERENCE fusion trainer's step throughput on torch CPU.

Grounds bench.py's ``BASELINE_FUNCTIONS_PER_SEC`` in a measurement instead of
an estimate: instantiates the reference's production model
(``Multi_DefectModel_new_GCN``, /root/reference/mvuld/models/GraphModel.py:81)
through the same fake-dgl shim the golden-parity tests use, and times its
full training step — forward, LabelSmoothingCE(0.1) loss, backward, AdamW —
at the reference's published batch size 4
(/root/reference/mvuld/main_bigvul.py:124,180-186) with 100-node graphs
(the reference pads/caps at max_node=100, data/data_list.py).

Run:  python -m mvuld_tpu.tools.baseline_torch
Prints one JSON line {"functions_per_sec": ..., "batch": 4, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _load_shim_helpers():
    """Reuse the fake-dgl/timm/torch._six shims from the parity test module
    (tests/test_fusion_parity.py) — one implementation, two consumers."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(repo, "tests"))
    import test_fusion_parity as tfp
    return tfp


def measure(batch: int = 4, nodes: int = 100, steps: int = 30,
            warmup: int = 5) -> dict:
    import numpy as np
    import torch

    torch.manual_seed(0)
    tfp = _load_shim_helpers()

    # install shims + load the reference module read-only (same sequence as
    # the ref_modules fixture, without pytest)
    import types

    shims = {}
    shims.update(tfp._make_fake_dgl(torch))
    shims.update(tfp._make_timm_stub(torch))
    six = types.ModuleType("torch._six")
    six.inf = float("inf")
    shims["torch._six"] = six
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tv.models = tvm
    shims["torchvision"] = tv
    shims["torchvision.models"] = tvm
    installed = []
    for name, mod in shims.items():
        if name not in sys.modules:
            sys.modules[name] = mod
            installed.append(name)
    sys.path.insert(0, tfp.REF_ROOT)
    import importlib.util
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [tfp.REF_MODELS]
    sys.modules["refmodels"] = pkg
    spec = importlib.util.spec_from_file_location(
        "refmodels.GraphModel",
        os.path.join(tfp.REF_MODELS, "GraphModel.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refmodels.GraphModel"] = mod
    spec.loader.exec_module(mod)

    model = mod.Multi_DefectModel_new_GCN(config=tfp._Cfg())
    model.train()

    rng = np.random.RandomState(0)
    sizes = [nodes] * batch
    ntot = sum(sizes)
    node_emb = rng.randn(ntot, 768).astype(np.float32)
    pos = rng.rand(ntot, 4).astype(np.float32)
    adj = np.zeros((ntot, ntot), bool)
    off = 0
    for n in sizes:
        for i in range(n):
            adj[off + i, off + i] = True
            if i + 1 < n:
                adj[off + i, off + i + 1] = True
        off += n
    img = torch.tensor(rng.randn(batch, 1024).astype(np.float32))
    text = torch.tensor(rng.randn(batch, 768).astype(np.float32))
    func_rows = np.repeat(text.numpy(), nodes, axis=0)
    dgl_mod = sys.modules["dgl"]
    g = dgl_mod.FakeBatchedGraph(
        sizes, torch.tensor(adj),
        {"_UNIX_NODE_EMB": torch.tensor(node_emb),
         "_FUNC_EMB": torch.tensor(func_rows),
         "pos_emb": torch.tensor(pos)})
    labels = torch.tensor(rng.randint(0, 2, batch))

    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=0.05)
    crit = torch.nn.CrossEntropyLoss(label_smoothing=0.1)

    def step():
        opt.zero_grad()
        logits = model(g, img, text)
        loss = crit(logits, labels)
        loss.backward()
        opt.step()
        return float(loss.detach())

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0

    for name in installed:
        sys.modules.pop(name, None)
    return {
        "metric": "reference_fusion_train_functions_per_sec_torch_cpu",
        "functions_per_sec": round(steps * batch / dt, 2),
        "batch": batch, "nodes_per_graph": nodes, "steps": steps,
        "sec_per_step": round(dt / steps, 4),
        "torch": torch.__version__, "device": "cpu",
    }


def measure_swin(batch: int = 4, img: int = 448, steps: int = 2,
                 warmup: int = 1) -> dict:
    """Measure the REFERENCE SwinV2-Base-448 fine-tune step on torch CPU.

    Grounds bench.py's image-side baseline the same way ``measure`` grounds
    the fusion side: instantiates the reference's own model
    (/root/reference/mvuld/models/swin_transformer_v2.py:503) at the paper's
    fine-tune config (configs/mySwin/swinv2_base_patch4_window24to28_
    384to448_1ktoMYDATA_ft.yaml: embed 128, depths [2,2,18,2], heads
    [4,8,16,32], window 28, drop-path 0.2) and published batch size 4
    (main.py --batch-size default), and times the full training step —
    forward, CrossEntropy(label_smoothing=0.1), backward, AdamW.

    The timm DropPath stub is an identity (the parity tests' stub), which
    can only make the reference FASTER — the resulting speedup multiplier
    understates rather than inflates.
    """
    import numpy as np
    import torch

    torch.manual_seed(0)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(repo, "tests"))
    import test_swin_v2 as tsv

    injected = tsv._stub_timm()
    sys.path.insert(0, "/root/reference/mvuld/models")
    import importlib
    ref_mod = importlib.import_module("swin_transformer_v2")
    model = ref_mod.SwinTransformerV2(
        img_size=img, patch_size=4, in_chans=3, num_classes=2,
        embed_dim=128, depths=[2, 2, 18, 2], num_heads=[4, 8, 16, 32],
        window_size=28, drop_path_rate=0.2,
        pretrained_window_sizes=[12, 12, 12, 6])
    model.train()

    rng = np.random.RandomState(0)
    x = torch.tensor(rng.randn(batch, 3, img, img).astype(np.float32))
    labels = torch.tensor(rng.randint(0, 2, batch))
    opt = torch.optim.AdamW(model.parameters(), lr=1e-5, weight_decay=0.05)
    crit = torch.nn.CrossEntropyLoss(label_smoothing=0.1)

    def step():
        opt.zero_grad()
        loss = crit(model(x), labels)
        loss.backward()
        opt.step()
        return float(loss.detach())

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0

    for name in injected:
        sys.modules.pop(name, None)
    return {
        "metric": "reference_swinv2_base_448_train_images_per_sec_torch_cpu",
        "images_per_sec": round(steps * batch / dt, 3),
        "batch": batch, "img_size": img, "steps": steps,
        "sec_per_step": round(dt / steps, 2),
        "torch": torch.__version__, "device": "cpu",
        "cpu_threads": torch.get_num_threads(),
    }


if __name__ == "__main__":
    if "--swin" in sys.argv:
        print(json.dumps(measure_swin()))
    else:
        print(json.dumps(measure()))
