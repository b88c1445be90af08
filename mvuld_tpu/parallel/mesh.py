"""Device mesh and sharding setup — the TPU replacement for torch DDP.

The reference's distribution stack is single-axis DDP over NCCL
(torch.distributed.launch, DistributedSampler, allreduce; SURVEY §2.5).
TPU-native mapping:

  * one process, an ICI mesh of chips: ``Mesh(devices, ("dp", "mp"))``;
  * the batch dim is sharded over "dp" (DistributedSampler → sharding);
  * gradients are averaged by XLA's reduce-sum over "dp" automatically when
    the loss is a mean over the global batch under jit-with-shardings — no
    explicit allreduce (the NCCL allreduce / reduce_tensor equivalents);
  * "mp" is reserved for tensor-parallel sharding of encoder weights.

Everything uses the modern ``jax.sharding`` API: jit with in/out shardings —
no pmap.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, mp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp in (-1, 0):
        dp = len(devices) // mp
    if dp * mp > len(devices):
        raise ValueError(f"mesh {dp}×{mp} needs {dp*mp} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-side batch pytree onto the mesh, batch-dim sharded.

    The global batch size must divide the dp axis (the host pipeline pads the
    final partial batch, mirroring the reference's drop_last/pad behavior).
    """
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_superbatch(mesh: Mesh, superbatch: Any) -> Any:
    """Place a stacked [K, B, ...] superbatch (K fused steps) on the mesh
    with the BATCH axis (axis 1) sharded over dp; the scanned step axis K is
    replicated. Using :func:`shard_batch` here would shard the step axis —
    wrong whenever K != dp and silently not data-parallel when K == dp."""
    sh = NamedSharding(mesh, P(None, "dp"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), superbatch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)

# Tensor-parallel ("mp") sharding rules for the encoder weights.
# Megatron-style pairing: column-parallel layers shard their OUTPUT features
# (fc1 / qkv / cpb_fc1 kernels + biases), the following row-parallel layer
# shards its INPUT features (fc2 / proj kernels) — XLA's GSPMD partitioner
# then keeps the intermediate activations mp-sharded and inserts the single
# reduce-scatter/all-reduce at the row-parallel output. Sharding specs are
# layout hints under jit: any spec is CORRECT (XLA reshards as needed);
# these are the profitable ones.
_TP_COL = ("fc1", "intermediate", "cpb_fc1")     # shard last axis
_TP_ROW = ("fc2", "mlp_output", "proj")          # shard axis -2 of kernel


def tp_spec(path, leaf) -> P:
    """PartitionSpec for one encoder parameter under tensor parallelism.
    Works for both per-block and nn.scan-stacked (leading depth axis)
    layouts because specs are anchored to the TRAILING axes."""
    names = [getattr(p, "key", "") for p in path]
    nd = getattr(leaf, "ndim", 0)
    if nd == 0:
        return P()
    last = names[-1] if names else ""
    def col():
        return P(*([None] * (nd - 1) + ["mp"]))
    if "qkv_kernel" in names:
        return col()
    for i, n in enumerate(names[:-1]):
        if n in _TP_COL and last in ("kernel", "bias"):
            return col()
        if n in _TP_ROW and last == "kernel" and nd >= 2:
            # "proj" is also the patch-embed conv's name — row-parallel only
            # applies to the attention output projection (scope "attn")
            if n == "proj" and "attn" not in names[:i]:
                continue
            return P(*([None] * (nd - 2) + ["mp", None]))
    return P()


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """Place encoder params on the mesh with mp tensor-parallel sharding
    (replicated over dp). Divisibility: sharded feature axes must divide the
    mp axis size — true for every SwinV2 width with mp ∈ {1, 2, 4, 8}."""
    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, tp_spec(path, leaf)))
    return jax.tree_util.tree_map_with_path(place, params)


def enable_compile_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache — repeated runs of the same program
    (bench, dryrun, trainers) skip the multi-minute TPU compile.

    Default path is ``~/.cache/mvuld_jax_cache`` (survives reboots and is
    shared between the builder session and the driver's bench run — /tmp is
    not guaranteed to be). Override with ``MVULD_CACHE_DIR``; set it to the
    empty string to disable persistence entirely (used by the CPU dryrun
    subprocess so cross-machine XLA:CPU AOT entries can never SIGILL it).
    """
    import os

    import jax
    if path is None:
        path = os.environ.get(
            "MVULD_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "mvuld_jax_cache"))
    if not path:
        return
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
