"""Tests for metrics, viz, checkpoint, logger, data pipeline."""

import numpy as np
import pytest


def test_ari_matches_sklearn():
    from sklearn.metrics import adjusted_rand_score
    from ocrl_tpu.utils import adjusted_rand_index

    rng = np.random.default_rng(0)
    for _ in range(10):
        t = rng.integers(0, 5, size=200)
        p = rng.integers(0, 7, size=200)
        expected = adjusted_rand_score(t, p)
        got = float(adjusted_rand_index(t, p, 5, 7))
        assert got == pytest.approx(expected, abs=1e-5)

    # correlated labelings (non-trivial ARI)
    t = rng.integers(0, 4, size=300)
    p = t.copy()
    p[:30] = (p[:30] + 1) % 4
    assert float(adjusted_rand_index(t, p, 4, 4)) == pytest.approx(
        adjusted_rand_score(t, p), abs=1e-5
    )

    # degenerate: both single-cluster -> 1.0 like sklearn
    t = np.zeros(50, dtype=int)
    p = np.zeros(50, dtype=int)
    assert float(adjusted_rand_index(t, p, 3, 3)) == pytest.approx(1.0)


def test_calculate_ari_mask_form():
    from sklearn.metrics import adjusted_rand_score
    from ocrl_tpu.utils import calculate_ari

    rng = np.random.default_rng(1)
    B, K, H, W = 3, 4, 8, 8
    true_ids = rng.integers(0, K, size=(B, H * W))
    pred_ids = rng.integers(0, K, size=(B, H * W))
    tm = np.eye(K)[true_ids].transpose(0, 2, 1).reshape(B, K, H, W, 1)
    pm = np.eye(K)[pred_ids].transpose(0, 2, 1).reshape(B, K, H, W, 1)
    got = np.asarray(calculate_ari(tm, pm))
    for b in range(B):
        assert got[b] == pytest.approx(adjusted_rand_score(true_ids[b], pred_ids[b]), abs=1e-5)


def test_hungarian_matching():
    from ocrl_tpu.utils import hungarian_matching

    target = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    inputs = target[[2, 0, 1]]
    col = hungarian_matching(target, inputs)
    np.testing.assert_array_equal(inputs[col], target)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from ocrl_tpu.utils import save_checkpoint, load_checkpoint

    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.int32(7)}
    save_checkpoint(tmp_path / "m.ckpt", tree, {"step": 7, "best_val_loss": 0.5})
    restored, meta = load_checkpoint(tmp_path / "m.ckpt", tree)
    assert meta["step"] == 7
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))


def test_logger(tmp_path):
    from ocrl_tpu.config.node import from_dict
    from ocrl_tpu.utils import init_wandb, logger, Image

    cfg = from_dict({"run_dir": str(tmp_path / "run"), "a": 1})
    run = init_wandb(cfg, "test-run", tags=["t1"])
    run.log({"train/loss": 1.5}, step=0)
    run.log({"samples": [Image(np.zeros((4, 4, 3), dtype=np.uint8))]}, step=1)
    assert (tmp_path / "run" / "metrics.jsonl").exists()
    assert (tmp_path / "run" / "config.yaml").exists()
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    run.finish()
    assert logger.run is None


def _make_h5(path, n_train=100, n_val=30, with_masks=False):
    import h5py

    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for split, n in [("TrainingSet", n_train), ("ValidationSet", n_val)]:
            grp = f.create_group(split)
            grp.create_dataset("obss", data=rng.integers(0, 255, size=(n, 16, 16, 3), dtype=np.uint8))
            grp.create_dataset("labels", data=rng.integers(0, 4, size=(n,)))
            grp.create_dataset("num_objs", data=np.full(n, 4))
            if with_masks:
                grp.create_dataset("masks", data=rng.integers(0, 2, size=(n, 5, 16, 16, 1)))


def test_dataloader(tmp_path):
    from ocrl_tpu.data import H5Dataset, DataLoader

    path = tmp_path / "d.hdf5"
    _make_h5(path)
    train = DataLoader(H5Dataset(path, "TrainingSet"), batch_size=16, shuffle=True, seed=0, chunk_size=32)
    batches = list(train)
    assert len(batches) == 100 // 16
    for b in batches:
        assert b["obss"].shape == (16, 16, 16, 3)
        # images stay uint8 on the host; /255 normalisation happens on-device
        assert b["obss"].dtype == np.uint8
        assert "num_objs" not in b
        assert b["labels"].dtype == np.int32

    # two epochs shuffle differently
    e1 = np.stack([b["obss"] for b in train])
    e2 = np.stack([b["obss"] for b in train])
    assert not np.allclose(e1, e2)

    val = DataLoader(H5Dataset(path, "ValidationSet"), batch_size=16, shuffle=False)
    vb = list(val)
    assert len(vb) == 2 and vb[-1]["obss"].shape[0] == 14  # final partial batch


def test_prefetch_to_device(tmp_path):
    from ocrl_tpu.data import H5Dataset, DataLoader, prefetch_to_device
    import jax

    path = tmp_path / "d.hdf5"
    _make_h5(path, n_train=40)
    dl = DataLoader(H5Dataset(path, "TrainingSet"), batch_size=8, shuffle=True)
    out = list(prefetch_to_device(dl, size=2))
    assert len(out) == 5
    assert isinstance(out[0]["obss"], jax.Array)


def test_prefetch_superbatch_slices_match(tmp_path):
    """superbatch staging must yield exactly the source batches, in order."""
    from ocrl_tpu.data import H5Dataset, DataLoader, prefetch_to_device
    import numpy as np

    path = tmp_path / "d.hdf5"
    _make_h5(path, n_train=40)
    dl = DataLoader(H5Dataset(path, "TrainingSet"), batch_size=8, shuffle=True, seed=3)
    plain = [np.asarray(b["obss"]) for b in dl]
    dl2 = DataLoader(H5Dataset(path, "TrainingSet"), batch_size=8, shuffle=True, seed=3)
    sb = [np.asarray(b["obss"]) for b in prefetch_to_device(dl2, superbatch=3)]
    assert len(sb) == len(plain)
    for a, b in zip(plain, sb):
        np.testing.assert_array_equal(a, b)


def test_prefetch_yield_whole(tmp_path):
    """yield_whole groups k batches into one k*B-row dict (tail kept)."""
    from ocrl_tpu.data import H5Dataset, DataLoader, prefetch_to_device
    import numpy as np

    path = tmp_path / "d.hdf5"
    _make_h5(path, n_train=40)
    dl = DataLoader(H5Dataset(path, "TrainingSet"), batch_size=8, shuffle=True, seed=3)
    plain = [np.asarray(b["obss"]) for b in dl]
    dl2 = DataLoader(H5Dataset(path, "TrainingSet"), batch_size=8, shuffle=True, seed=3)
    whole = [np.asarray(b["obss"])
             for b in prefetch_to_device(dl2, superbatch=3, yield_whole=True)]
    assert [w.shape[0] for w in whole] == [24, 16]  # 3+2 batches of 8
    np.testing.assert_array_equal(np.concatenate(whole), np.concatenate(plain))
