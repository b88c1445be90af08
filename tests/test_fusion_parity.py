"""Golden parity: MultiDefectAblation vs the reference torch fusion classes.

The reference classes (mvuld/models/GraphModel.py, new_model.py, myModels.py,
MotivationModel.py) import dgl, torchvision, timm and a torch._six that no
longer exists; this test installs minimal SCOPED shims — including a faithful
dense-adjacency dgl.GATConv — imports the reference classes read-only,
seeds them, converts the state_dict with fusion_torch_to_flax, and asserts
logits allclose for EVERY registry key's reference counterpart.

This is the adjudication the round-1 verdict asked for (e.g. _110 vs _GATPOS
are structurally different models — pos after vs before the GAT).
"""

import contextlib
import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.config import default_config
from mvuld_tpu.models.fusion_convert import fusion_torch_to_flax
from mvuld_tpu.models.fusion_zoo import build_fusion_model

pytestmark = pytest.mark.slow  # heavy: excluded from the -m 'not slow' quick lane

REF_MODELS = "/root/reference/mvuld/models"
REF_ROOT = "/root/reference/mvuld"

# registry key → (reference module, reference class, pads_to_max_node)
# pads_to_max_node=False: the class uses the dynamic unbatch (pad to the
# batch's max graph size, myModels.py:141-156) — parity needs N = max(sizes).
CASES = {
    "multi_defect_new_gcn": ("GraphModel", "Multi_DefectModel_new_GCN", True),
    "multi_defect": ("GraphModel", "Multi_DefectModel", True),
    "multi_defect_nograph": ("GraphModel", "Multi_DefectModel_noGraph", True),
    "multi_defect_000": ("GraphModel", "Multi_DefectModel_000", True),
    "multi_defect_001": ("GraphModel", "Multi_DefectModel_001", True),
    "multi_defect_100": ("GraphModel", "Multi_DefectModel_100", True),
    "multi_defect_110": ("GraphModel", "Multi_DefectModel_110", True),
    "multi_defect_gatpos": ("GraphModel", "Multi_DefectModel_GATPOS", True),
    "multi_defect_011": ("GraphModel", "Multi_DefectModel_011", True),
    "multi_defect_nogat": ("GraphModel", "Multi_DefectModel_NOGAT", True),
    "multi_defect_nogat2": ("GraphModel", "Multi_DefectModel_NOGAT2", True),
    "multi_defect_nogat3": ("GraphModel", "Multi_DefectModel_NOGAT3", True),
    "multi_defect_nogat4": ("GraphModel", "Multi_DefectModel_NOGAT4", True),
    "multi_defect_noglobalimage": ("new_model",
                                   "Multi_DefectModel_noGlobalImage", True),
    "multi_defect_nofunc": ("new_model", "Multi_DefectModel_noFunc", True),
    "multi_defect_allnode": ("myModels", "Multi_DefectModel_allnode", False),
    "multi_defect_grudot": ("myModels", "Multi_DefectModel_grudot", False),
    "multi_defect_gruproj": ("myModels", "Multi_DefectModel", False),
    "motivation_image": ("MotivationModel", "Multi_DefectModel_Image", True),
    "motivation_functext": ("MotivationModel",
                            "Multi_DefectModel_FuncText", True),
    "motivation_graph": ("MotivationModel", "Multi_DefectModel_Graph", True),
    "motivation_graph1": ("MotivationModel", "Multi_DefectModel_Graph1", True),
    "motivation_graph_mean": ("MotivationModel",
                              "Multi_DefectModel_Graph2", True),
}


def _make_fake_dgl(torch):
    """Minimal dgl shim: dense-adjacency batched graph, faithful GATConv."""
    import torch.nn as tnn
    import torch.nn.functional as tF

    class FakeSubGraph:
        def __init__(self, ndata, n):
            self.ndata = ndata
            self._n = n

        def number_of_nodes(self):
            return self._n

    class FakeBatchedGraph:
        """sizes: per-graph node counts; adj_dense: [Ntot, Ntot] bool
        src→dst; ndata: {name: [Ntot, ...] tensor}."""

        def __init__(self, sizes, adj_dense, ndata):
            self.sizes = list(sizes)
            self.adj_dense = adj_dense
            self.ndata = dict(ndata)

        def number_of_nodes(self):
            return sum(self.sizes)

        @contextlib.contextmanager
        def local_scope(self):
            saved = dict(self.ndata)
            try:
                yield self
            finally:
                self.ndata = saved

    def unbatch(g):
        outs, off = [], 0
        for n in g.sizes:
            outs.append(FakeSubGraph(
                {k: v[off:off + n] for k, v in g.ndata.items()}, n))
            off += n
        return outs

    def mean_nodes(g, key):
        outs, off = [], 0
        for n in g.sizes:
            outs.append(g.ndata[key][off:off + n].mean(dim=0))
            off += n
        return torch.stack(outs)

    class GATConv(tnn.Module):
        """dgl.nn.pytorch.GATConv over the dense adjacency: additive
        attention el(src)+er(dst), LeakyReLU(0.2), softmax over in-neighbors
        of each destination, out = Σ α·(W h_src) + bias."""

        def __init__(self, in_feats, out_feats, num_heads, feat_drop=0.0,
                     attn_drop=0.0, negative_slope=0.2, **kw):
            super().__init__()
            self.num_heads, self.out_feats = num_heads, out_feats
            self.fc = tnn.Linear(in_feats, out_feats * num_heads, bias=False)
            self.attn_l = tnn.Parameter(
                torch.randn(1, num_heads, out_feats) * 0.1)
            self.attn_r = tnn.Parameter(
                torch.randn(1, num_heads, out_feats) * 0.1)
            self.bias = tnn.Parameter(torch.zeros(num_heads * out_feats))
            self.feat_drop = tnn.Dropout(feat_drop)
            self.negative_slope = negative_slope

        def forward(self, graph, feat):
            H, D = self.num_heads, self.out_feats
            z = self.fc(self.feat_drop(feat)).view(-1, H, D)      # [N, H, D]
            el = (z * self.attn_l).sum(-1)                         # [N, H]
            er = (z * self.attn_r).sum(-1)
            e = el[:, None, :] + er[None, :, :]                    # [src,dst,H]
            e = tF.leaky_relu(e, self.negative_slope)
            mask = graph.adj_dense[:, :, None]
            e = e.masked_fill(~mask, float("-inf"))
            alpha = tF.softmax(e, dim=0)                           # over src
            alpha = torch.nan_to_num(alpha)
            out = torch.einsum("ijh,ihd->jhd", alpha, z)
            # reference code calls .view() on the result — keep it contiguous
            return (out + self.bias.view(1, H, D)).contiguous()

    dgl = types.ModuleType("dgl")
    dgl.unbatch = unbatch
    dgl.mean_nodes = mean_nodes
    dgl.FakeBatchedGraph = FakeBatchedGraph
    nn_mod = types.ModuleType("dgl.nn")
    py_mod = types.ModuleType("dgl.nn.pytorch")
    py_mod.GATConv = GATConv
    py_mod.GraphConv = type("GraphConv", (tnn.Module,), {})
    py_mod.GatedGraphConv = type("GatedGraphConv", (tnn.Module,), {})
    nn_mod.pytorch = py_mod
    dgl.nn = nn_mod
    return {"dgl": dgl, "dgl.nn": nn_mod, "dgl.nn.pytorch": py_mod}


def _make_timm_stub(torch):
    import torch.nn as tnn
    layers = types.ModuleType("timm.models.layers")

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    layers.DropPath = DropPath
    layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    layers.trunc_normal_ = lambda t, std=1.0, **kw: tnn.init.trunc_normal_(
        t, std=std)
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm.models = models
    return {"timm": timm, "timm.models": models,
            "timm.models.layers": layers}


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    injected = {}
    shims = {}
    shims.update(_make_fake_dgl(torch))
    shims.update(_make_timm_stub(torch))
    six = types.ModuleType("torch._six")
    six.inf = float("inf")
    shims["torch._six"] = six
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tv.models = tvm
    shims["torchvision"] = tv
    shims["torchvision.models"] = tvm
    for name, mod in shims.items():
        if name not in sys.modules:
            sys.modules[name] = mod
            injected[name] = mod
    sys.path.insert(0, REF_ROOT)  # for `from utils import ...`

    # import the reference model files as a package (they use relative
    # imports: .fusion, .Rs_GCN, .build)
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [REF_MODELS]
    sys.modules["refmodels"] = pkg
    loaded = {"refmodels": pkg}

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", f"{REF_MODELS}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        loaded[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    mods = {name: load(name)
            for name in ("GraphModel", "new_model", "MotivationModel",
                         "myModels")}
    yield torch, mods, sys.modules["dgl"]
    for name in list(loaded) + list(injected):
        sys.modules.pop(name, None)
    for name in ("utils", "fusion", "mlp", "Rs_GCN", "build",
                 "swin_transformer", "swin_transformer_v2",
                 "swin_transformer_moe", "swin_mlp",
                 "refmodels.fusion", "refmodels.mlp", "refmodels.Rs_GCN",
                 "refmodels.build", "refmodels.swin_transformer",
                 "refmodels.swin_transformer_v2",
                 "refmodels.swin_transformer_moe", "refmodels.swin_mlp"):
        sys.modules.pop(name, None)
    with contextlib.suppress(ValueError):
        sys.path.remove(REF_ROOT)


def _inputs(torch, pads_to_max_node, seed=0):
    """Build one batch in both layouts (dense [B,N,·] and concatenated)."""
    rng = np.random.RandomState(seed)
    sizes = [5, 8]
    B = len(sizes)
    N = 100 if pads_to_max_node else max(sizes)
    ntot = sum(sizes)
    node_emb = rng.randn(ntot, 768).astype(np.float32)
    ntype = rng.randint(0, 32, ntot).astype(np.int32)
    allemb = np.concatenate([node_emb, np.eye(32, dtype=np.float32)[ntype]],
                            axis=1)                               # [ntot, 800]
    pos = rng.rand(ntot, 4).astype(np.float32)
    func_emb = rng.randn(B, 768).astype(np.float32)
    img = rng.randn(B, 1024).astype(np.float32)
    text = rng.randn(B, 768).astype(np.float32)

    adj = np.zeros((ntot, ntot), bool)
    dense_adj = np.zeros((B, N, N), bool)
    off = 0
    for b, n in enumerate(sizes):
        for i in range(n):
            adj[off + i, off + i] = True
            dense_adj[b, i, i] = True
            if i + 1 < n:
                adj[off + i, off + i + 1] = True
                dense_adj[b, i, i + 1] = True
        off += n

    dgl_mod = sys.modules["dgl"]
    func_rows = np.concatenate(
        [np.repeat(func_emb[b:b + 1], n, axis=0)
         for b, n in enumerate(sizes)])
    g = dgl_mod.FakeBatchedGraph(
        sizes, torch.tensor(adj),
        {"_UNIX_NODE_EMB": torch.tensor(node_emb),
         "_ALL_NODE_EMB": torch.tensor(allemb),
         "_FUNC_EMB": torch.tensor(func_rows),
         "pos_emb": torch.tensor(pos)})

    dense = {
        "img_emb": img, "text_emb": text,
        "node_emb": np.zeros((B, N, 768), np.float32),
        "pos": np.zeros((B, N, 4), np.float32),
        "adj": dense_adj,
        "node_mask": np.zeros((B, N), np.float32),
        "ntype": np.zeros((B, N), np.int32),
    }
    off = 0
    for b, n in enumerate(sizes):
        dense["node_emb"][b, :n] = node_emb[off:off + n]
        dense["pos"][b, :n] = pos[off:off + n]
        dense["node_mask"][b, :n] = 1.0
        dense["ntype"][b, :n] = ntype[off:off + n]
        off += n
    return g, torch.tensor(img), torch.tensor(text), dense


class _Cfg:
    """Tiny stand-in for the yacs config the reference constructors read."""

    class MODEL:
        NUM_CLASSES = 2


def _randomize_bn(torch, model, seed):
    gen = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.normal_(0.0, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)
            m.weight.data.normal_(1.0, 0.3, generator=gen)
            m.bias.data.normal_(0.0, 0.3, generator=gen)


@pytest.mark.parametrize("arch", sorted(CASES))
def test_fusion_golden_parity(ref_modules, arch):
    torch, mods, _dgl = ref_modules
    mod_name, cls_name, pads = CASES[arch]
    torch.manual_seed(hash(arch) % (2 ** 31))
    ref = getattr(mods[mod_name], cls_name)(_Cfg).eval()
    _randomize_bn(torch, ref, seed=hash(arch) % (2 ** 31))

    g, img_t, text_t, dense = _inputs(torch, pads)
    with torch.no_grad():
        want = ref(g, img_t, text_t).numpy()

    model = build_fusion_model(default_config(), arch=arch)
    variables = fusion_torch_to_flax(ref.state_dict(), model)
    args = {k: jnp.asarray(v) for k, v in dense.items()}
    got = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, **args, train=False))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
