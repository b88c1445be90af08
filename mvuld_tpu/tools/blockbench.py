"""Microbenchmark the SwinV2 block GEMM bucket on the TPU chip.

The r3 profile localized the remaining step time in the "GEMM fusion"
bucket: LN-fused bf16 GEMMs (MLP fc1/fc2, attention proj/qkv) running at
35-48% MXU utilization while the attention kernels sit on their streaming
floors. This harness times the stage-3 MLP+LN residual sub-block (the
dominant GEMM shape at 448²: M=B·784, K=512, N=2048) in isolation so
fusion-boundary and Pallas-kernel experiments can be compared without a
50-minute whole-model compile.

Relay rule (NOTES_r3): single dispatches carry 30-40 ms RPC noise — chain
iterations through a lax.scan data dependency and divide.

Run:  PYTHONPATH=/root/.axon_site:$PWD python -m mvuld_tpu.tools.blockbench \
          --variant v0 --iters 24 --batch 64
Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def build_mlp_ln(variant: str, M: int, C: int = 512, Hd: int = 2048,
                 remat: bool = False):
    """Return (step_fn, params, x0, flops_per_iter) for the post-norm MLP
    residual sub-block  x + LN(GELU(x@W1+b1)@W2+b2)  — the exact math of
    SwinBlockV2's second half (models/swin_v2.py:488-492)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    params = {
        "w1": jnp.asarray(rng.randn(C, Hd) * 0.02, jnp.float32),
        "b1": jnp.zeros((Hd,), jnp.float32),
        "w2": jnp.asarray(rng.randn(Hd, C) * 0.02, jnp.float32),
        "b2": jnp.zeros((C,), jnp.float32),
        "gamma": jnp.ones((C,), jnp.float32),
        "beta": jnp.zeros((C,), jnp.float32),
    }
    x0 = jnp.asarray(rng.randn(M, C), jnp.bfloat16)

    def ln(z, gamma, beta):
        zf = z.astype(jnp.float32)
        mu = zf.mean(-1, keepdims=True)
        var = ((zf - mu) ** 2).mean(-1, keepdims=True)
        return ((zf - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta)

    barrier = jax.lax.optimization_barrier

    def mlp(p, x):
        w1 = p["w1"].astype(jnp.bfloat16)
        w2 = p["w2"].astype(jnp.bfloat16)
        if variant == "v0":            # XLA default fusion (production path)
            h = jax.nn.gelu(x @ w1 + p["b1"].astype(jnp.bfloat16))
            z = h @ w2 + p["b2"].astype(jnp.bfloat16)
            y = ln(z, p["gamma"], p["beta"]).astype(jnp.bfloat16)
        elif variant == "v1":          # barriers: pure dots, separate epilogues
            h = barrier(x @ w1)
            h = jax.nn.gelu(h + p["b1"].astype(jnp.bfloat16))
            h = barrier(h)
            z = barrier(h @ w2)
            y = ln(z + p["b2"].astype(jnp.bfloat16), p["gamma"],
                   p["beta"]).astype(jnp.bfloat16)
        elif variant == "v2":          # fp32 accum dots via preferred_element_type
            h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            h = jax.nn.gelu(h + p["b1"]).astype(jnp.bfloat16)
            z = jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            y = ln(z + p["b2"], p["gamma"], p["beta"]).astype(jnp.bfloat16)
        elif variant == "v3":          # pallas fused LN+GEMM kernels
            from mvuld_tpu.ops.fused_dense import dense_act, dense_ln
            h = dense_act(x, p["w1"], p["b1"], act="gelu")
            y = dense_ln(h, p["w2"], p["b2"], p["gamma"], p["beta"])
        elif variant == "v4":          # single fused MLP+LN kernel
            from mvuld_tpu.ops.fused_dense import mlp_ln
            y = mlp_ln(x, p["w1"], p["b1"], p["w2"], p["b2"], p["gamma"],
                       p["beta"], False)
        else:
            raise ValueError(variant)
        return x + y.astype(jnp.bfloat16)

    block = jax.checkpoint(mlp) if remat else mlp

    def loss_fn(p, x):
        return block(p, x).astype(jnp.float32).sum() * 1e-6

    # grads w.r.t. params AND x — in the model the residual stream carries
    # dx through every block, so a kernel comparison must include it
    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def fwd_bwd_iter(carry, _):
        p, x = carry
        loss, (gp, gx) = grad_fn(p, x)
        # the GRADIENTS must feed the carry, or XLA dead-code-eliminates the
        # whole backward pass (and CSEs the loss's forward with the chain's):
        # fold every grad leaf into x so nothing is removable
        gsum = sum(jnp.sum(v.astype(jnp.float32)) for v in gp.values())
        x = x + gx.astype(jnp.bfloat16) * 1e-9 \
            + (loss + gsum).astype(jnp.bfloat16) * 1e-9 \
            + gp["b2"].astype(jnp.bfloat16)[None, :] * 1e-9
        return (p, x), loss

    def fwd_iter(carry, _):
        p, x = carry
        return (p, mlp(p, x)), jnp.float32(0)

    flops_fwd = 2 * 2 * M * C * Hd            # two GEMMs
    return mlp, fwd_iter, fwd_bwd_iter, params, x0, flops_fwd


def run_variant(variant: str, M: int, iters: int, mode: str,
                repeats: int = 3, C: int = 512, Hd: int = 2048,
                remat: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    mlp, fwd_iter, fwd_bwd_iter, params, x0, flops_fwd = build_mlp_ln(
        variant, M, C, Hd, remat=remat)
    body = fwd_iter if mode == "fwd" else fwd_bwd_iter
    # GEMM passes per value_and_grad w.r.t. (params, x): fwd 2 + bwd
    # (dh, dx, dw1, dw2) 4 = 3x; remat recomputes the 2 fwd GEMMs = 4x
    # (v4's bwd kernel folds the recompute in either way)
    mult = 1.0 if mode == "fwd" else (4.0 if remat else 3.0)
    flops_iter = flops_fwd * mult

    @jax.jit
    def chain(p, x):
        (_, x), losses = jax.lax.scan(body, (p, x), None, length=iters)
        return x, losses

    t0 = time.time()
    x, losses = chain(params, x0)
    float(x[0, 0])
    compile_s = time.time() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        x, losses = chain(params, x0)
        float(x[0, 0])
        times.append(time.perf_counter() - t0)
    dt = min(times) / iters
    return {
        "variant": variant, "mode": mode, "M": M, "iters": iters,
        "ms_per_iter": round(dt * 1e3, 3),
        "tf_per_s": round(flops_iter / dt / 1e12, 1),
        "util_vs_139tf": round(flops_iter / dt / 139e12, 3),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="v0",
                    help="comma-separated: v0 xla, v1 barriers, v2 fp32-accum,"
                         " v3 pallas")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--mode", default="fwd_bwd", help="fwd | fwd_bwd | both")
    ap.add_argument("--dim", type=int, default=512, help="block channels C")
    ap.add_argument("--tokens", type=int, default=784,
                    help="tokens per image at this stage (M = batch·tokens)")
    ap.add_argument("--remat", action="store_true",
                    help="wrap the block in jax.checkpoint (production path)")
    args = ap.parse_args()

    from mvuld_tpu.parallel.mesh import enable_compile_cache
    enable_compile_cache()
    M = args.batch * args.tokens
    modes = ["fwd", "fwd_bwd"] if args.mode == "both" else [args.mode]
    for variant in args.variant.split(","):
        for mode in modes:
            print(json.dumps(run_variant(
                variant, M, args.iters, mode, C=args.dim, Hd=4 * args.dim,
                remat=args.remat)), flush=True)


if __name__ == "__main__":
    main()
