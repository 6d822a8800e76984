"""dp x tp sharded training step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vfmreg_tpu.models.vit import ViTConfig
from vfmreg_tpu.train import TrainConfig, create_train_state, make_train_step

pytestmark = pytest.mark.slow

TINY = ViTConfig(
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    patch_size=14,
    pretrain_img_size=56,
    use_flash_attention=False,
)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices())
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devs.reshape(2, 4), ("data", "model"))


def _batch(rng, b=4, hw=56, k=8, grid=16):
    ia = rng.normal(size=(b, hw, hw, 3)).astype(np.float32)
    ib = ia + 0.05 * rng.normal(size=ia.shape).astype(np.float32)
    idx = rng.randint(0, grid, (b, k)).astype(np.int32)
    return jnp.asarray(ia), jnp.asarray(ib), jnp.asarray(idx)


def test_train_step_runs_and_descends(mesh, rng):
    cfg = TrainConfig(adapter_hidden=64, adapter_out=32)
    with mesh:
        state, spec, tx = create_train_state(jax.random.PRNGKey(0), TINY, mesh, cfg)
        step = make_train_step(TINY, mesh, cfg, tx)
        ia, ib, idx = _batch(rng)
        losses = []
        for _ in range(5):
            state, metrics = step(state, ia, ib, idx)
            losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    # Loss decreases on a fixed batch
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_params_are_model_sharded(mesh):
    with mesh:
        state, spec, _ = create_train_state(jax.random.PRNGKey(0), TINY, mesh, TrainConfig(adapter_hidden=64))
    w = state.params["vit"]["blocks"][0]["q"]["w"]
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    # Output dim 64 split over 4 model shards -> 16 per shard
    assert (64, 16) in shard_shapes


def test_checkpoint_roundtrip(mesh, tmp_path, rng):
    from vfmreg_tpu.train.trainer import latest_checkpoint, restore_checkpoint, save_checkpoint

    cfg = TrainConfig(adapter_hidden=64, adapter_out=32)
    with mesh:
        state, _, tx = create_train_state(jax.random.PRNGKey(0), TINY, mesh, cfg)
        step = make_train_step(TINY, mesh, cfg, tx)
        ia, ib, idx = _batch(rng)
        state, _ = step(state, ia, ib, idx)
        path = save_checkpoint(tmp_path, state)
        assert latest_checkpoint(tmp_path) == path

        fresh, _, _ = create_train_state(jax.random.PRNGKey(1), TINY, mesh, cfg)
        restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 1
    a = np.asarray(state.params["adapter"]["fc1"]["w"])
    b = np.asarray(restored.params["adapter"]["fc1"]["w"])
    np.testing.assert_allclose(a, b)
