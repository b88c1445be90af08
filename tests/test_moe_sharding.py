"""Expert parallelism: MoE expert weights sharded over the mesh's mp axis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mvuld_tpu.models.moe import MoEFFN
from mvuld_tpu.parallel.mesh import make_mesh


@pytest.mark.slow
def test_moe_expert_sharded_forward():
    mesh = make_mesh(dp=2, mp=4)
    m = MoEFFN(hidden=32, out=16, num_experts=4, top_k=1, capacity_factor=2.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 24, 16).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)

    # shard expert-leading axes over "mp", batch over "dp"
    def shard_param(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if any(n in ("w1", "w2", "b1", "b2") for n in names):
            spec = P("mp") if leaf.ndim >= 1 and leaf.shape[0] == 4 else P()
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    flat = jax.tree_util.tree_map_with_path(shard_param, variables["params"])
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("dp")))

    @jax.jit
    def fwd(params, x):
        out, aux = m.apply({"params": params}, x)
        return out, aux

    with mesh:
        out, aux = fwd(flat, x_sharded)
    assert out.shape == (2, 24, 16)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(float(aux))
    # expert weights really live sharded over mp
    w1 = flat["w1"]
    assert isinstance(w1.sharding, NamedSharding)
    assert w1.sharding.spec == P("mp")
