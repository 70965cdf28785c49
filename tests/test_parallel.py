"""Data-parallel sharding tests (virtual 8-device CPU mesh; skip on 1 device)."""

import numpy as np
import pytest

import jax

from ocrl_tpu.config import compose
from ocrl_tpu.models import create_ocr

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs 8 devices (run via scripts/run_tests_cpu.sh)")


TINY = ["ocr=slate", "dataset=random-N5C4S4S2", "dataset.obs_size=16",
        "ocr.dvae.vocab_size=64", "ocr.dvae.d_model=32", "ocr.cnn.hidden_size=16",
        "ocr.slotattr.num_slots=3", "ocr.slotattr.slot_size=32",
        "ocr.slotattr.mlp_hidden_size=32", "ocr.tfdec.num_dec_blocks=2",
        "ocr.tfdec.num_dec_heads=2"]


@needs_mesh
def test_dp_train_step_runs_and_keeps_params_replicated():
    from ocrl_tpu.parallel import batch_sharding, make_mesh, shard_ocr

    cfg = compose("train_ocr", TINY)
    model = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    mesh = make_mesh(8)
    shard_ocr(model, mesh)
    obs = np.random.default_rng(0).random((16, 16, 16, 3)).astype("float32")
    obs = jax.device_put(obs, batch_sharding(mesh))
    m0 = model.update(obs, None, 0)
    m1 = model.update(obs, None, 1)
    assert np.isfinite(float(np.asarray(m1["loss"])))
    # params replicated on all 8 devices
    leaf = jax.tree.leaves(model.params)[0]
    assert len(leaf.sharding.device_set) == 8


@needs_mesh
def test_dp_matches_single_device_loss():
    """First DP step must produce the same loss as the single-device step
    (same params, same batch, same rng)."""
    from ocrl_tpu.parallel import batch_sharding, make_mesh, shard_ocr

    cfg = compose("train_ocr", TINY)
    obs = np.random.default_rng(1).random((16, 16, 16, 3)).astype("float32")

    single = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    loss_single = float(np.asarray(single.update(obs, None, 0)["loss"]))

    dp = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    mesh = make_mesh(8)
    shard_ocr(dp, mesh)
    obs_sharded = jax.device_put(obs, batch_sharding(mesh))
    loss_dp = float(np.asarray(dp.update(obs_sharded, None, 0)["loss"]))
    assert loss_dp == pytest.approx(loss_single, rel=1e-4)


@needs_mesh
def test_dryrun_multichip_entry():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


@needs_mesh
def test_dp_eval_and_samples_sharded():
    """eval/sample paths also run under the mesh (one step-fn definition,
    re-jitted with shardings by shard_ocr)."""
    from ocrl_tpu.parallel import batch_sharding, make_mesh, shard_ocr

    cfg = compose("train_ocr", TINY)
    model = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    mesh = make_mesh(8)
    shard_ocr(model, mesh)
    obs = np.random.default_rng(2).random((16, 16, 16, 3)).astype("float32")
    obs = jax.device_put(obs, batch_sharding(mesh))
    metrics = model.get_loss(obs)
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    grids = model.get_samples(obs)
    assert grids  # sample grids produced through the sharded path


@needs_mesh
def test_dp_update_many():
    """Scanned multi-step update under DP: superbatch sharded over the mesh,
    params stay replicated, metrics stacked (k,)."""
    from ocrl_tpu.parallel import batch_sharding, make_mesh, shard_ocr

    cfg = compose("train_ocr", TINY)
    model = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    mesh = make_mesh(8)
    shard_ocr(model, mesh)
    obs = np.random.default_rng(2).random((32, 16, 16, 3)).astype("float32")
    obs = jax.device_put(obs, batch_sharding(mesh))
    m = model.update_many(obs, None, 0, 2)  # k=2 steps of batch 16
    assert np.asarray(m["loss"]).shape == (2,)
    assert np.all(np.isfinite(np.asarray(m["loss"])))
    leaf = jax.tree.leaves(model.params)[0]
    assert len(leaf.sharding.device_set) == 8


@needs_mesh
def test_sharded_checkpoint_roundtrip(tmp_path):
    """A genuinely SHARDED tree round-trips through disk with sharding
    preserved and no host gather (orbax path, utils/sharded_checkpoint.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ocrl_tpu.parallel import make_mesh
    from ocrl_tpu.utils.sharded_checkpoint import load_sharded, save_sharded

    mesh = make_mesh(8)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    rng = np.random.default_rng(0)
    tree = {
        "w": jax.device_put(rng.random((16, 4)).astype("float32"), data),
        "b": jax.device_put(rng.random((4,)).astype("float32"), repl),
        "nested": {"k": jax.device_put(
            rng.random((8, 3)).astype("float32"), data)},
    }
    save_sharded(tmp_path / "ckpt", tree, {"step": 7})
    restored, meta = load_sharded(tmp_path / "ckpt", tree)
    assert meta == {"step": 7}
    for k in ("w", "b"):
        np.testing.assert_array_equal(np.asarray(restored[k]),
                                      np.asarray(tree[k]))
    np.testing.assert_array_equal(np.asarray(restored["nested"]["k"]),
                                  np.asarray(tree["nested"]["k"]))
    # sharding preserved: each device holds only its shard of "w"
    assert restored["w"].sharding == data
    assert len(restored["w"].addressable_shards) == 8
    shard = restored["w"].addressable_shards[0]
    assert shard.data.shape == (2, 4)  # 16 rows / 8 devices — NOT gathered
