import numpy as np
import pytest

from mvuld_tpu.data.loader import ArrayDataset, eval_batches, train_batches


def test_eval_batches_pad_and_mask():
    ds = ArrayDataset({"x": np.arange(10, dtype=np.float32),
                       "label": np.arange(10, dtype=np.int32)})
    batches = list(eval_batches(ds, 4))
    assert len(batches) == 3
    assert all(b["x"].shape == (4,) for b in batches)
    last = batches[-1]
    assert last["_valid"].tolist() == [1.0, 1.0, 0.0, 0.0]
    # padded rows repeat the final row (static shape, masked out downstream)
    assert last["x"][2] == last["x"][1]
    # total valid items across batches == dataset size
    assert sum(int(b["_valid"].sum()) for b in batches) == 10


def test_train_batches_epoch_shuffle_deterministic():
    ds = ArrayDataset({"x": np.arange(16, dtype=np.float32),
                       "label": np.zeros(16, np.int32)})
    a = [b["x"].tolist() for b in train_batches(ds, 4, epoch=1, seed=7)]
    b = [b["x"].tolist() for b in train_batches(ds, 4, epoch=1, seed=7)]
    c = [b["x"].tolist() for b in train_batches(ds, 4, epoch=2, seed=7)]
    assert a == b            # same (seed, epoch) → same order
    assert a != c            # different epoch reshuffles (set_epoch semantics)
    assert sorted(sum(a, [])) == list(np.arange(16.0))   # drop_last keeps all here


def test_train_batches_drop_last():
    ds = ArrayDataset({"x": np.arange(10, dtype=np.float32),
                       "label": np.zeros(10, np.int32)})
    batches = list(train_batches(ds, 4, epoch=0, seed=0))
    assert len(batches) == 2          # remainder of 2 dropped


def test_run_joern_gates_on_missing_binary(tmp_path):
    from mvuld_tpu.tools.joern_json import run_joern
    c = tmp_path / "f.c"
    c.write_text("int f(){return 0;}")
    assert run_joern(str(c), joern_bin="definitely_not_joern") is False


@pytest.mark.slow
def test_swin_train_step_on_dp_mp_mesh():
    """SwinV2 train step on a 4×2 (dp×mp) mesh — params replicated, batch on
    dp; validates that a nontrivial second axis doesn't break the step."""
    import jax
    import jax.numpy as jnp

    from mvuld_tpu.config import default_config
    from mvuld_tpu.core.optim import build_optimizer
    from mvuld_tpu.core.schedule import build_schedule
    from mvuld_tpu.core.train_state import TrainState, make_train_step
    from mvuld_tpu.models.swin_v2 import SwinTransformerV2, SwinV2Config
    from mvuld_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    cfg = default_config()
    cfg.PARALLEL.DTYPE = "float32"
    sc = SwinV2Config(img_size=16, patch_size=4, embed_dim=16, depths=(1, 1),
                      num_heads=(2, 2), window_size=4, drop_path_rate=0.0,
                      pretrained_window_sizes=(0, 0), num_classes=2,
                      dtype=jnp.float32)
    model = SwinTransformerV2(sc)
    B = 8
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((B, 16, 16, 3)))
    sched = build_schedule(cfg, 10, B)
    tx = build_optimizer(cfg, sched)
    state = TrainState.create(variables["params"], tx)

    def apply_fn(vs, batch, rngs, train, mutable=None):
        return model.apply(vs, batch["image"], deterministic=not train,
                           rngs=rngs)

    step = make_train_step(apply_fn, tx, donate=False)
    mesh = make_mesh(dp=4, mp=2)
    with mesh:
        state = replicate(mesh, state)
        batch = shard_batch(mesh, {
            "image": np.random.RandomState(0).randn(B, 16, 16, 3).astype(np.float32),
            "label": np.random.RandomState(1).randint(0, 2, B).astype(np.int32)})
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_prefetcher_overlaps_and_preserves_order():
    """Producer runs ahead of a slow consumer (the DataLoader-workers
    equivalent): all items are produced before the consumer finishes."""
    import time

    from mvuld_tpu.data.loader import Prefetcher

    def source():
        for i in range(5):
            yield i

    stamped = []
    pf = Prefetcher(source(), place_fn=lambda x: (x, time.time()), depth=2)
    got = []
    for x, produced_t in pf:
        time.sleep(0.05)            # simulate a device step
        got.append((x, produced_t, time.time()))
    assert [g[0] for g in got] == list(range(5))
    # item i+2 was already produced before item i finished consuming
    for i in range(len(got) - 2):
        assert got[i + 2][1] < got[i][2], (i, got)


def test_prefetcher_propagates_errors():
    import pytest as _pytest

    from mvuld_tpu.data.loader import Prefetcher

    def bad():
        yield 1
        raise ValueError("boom")

    it = iter(Prefetcher(bad()))
    assert next(it) == 1
    with _pytest.raises(ValueError, match="boom"):
        list(it)
