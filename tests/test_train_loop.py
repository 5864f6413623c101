"""train_loop smoke test (tiny config, CPU mesh)."""

import numpy as np
from PIL import Image

from pixelbox_tpu.parallel.mesh import make_mesh
from pixelbox_tpu.training.train import TrainConfig, train_loop

from fixtures import textured_image


def test_train_loop_end_to_end(tmp_path):
    for s in range(3):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            tmp_path / f"t{s}.png"
        )
    mesh = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    cfg = TrainConfig(latent_dim=8, input_size=32, batch_size=4)
    ckpt = tmp_path / "ckpts"
    state, losses = train_loop(
        [str(tmp_path / f"t{s}.png") for s in range(3)],
        cfg,
        mesh,
        epochs=2,
        steps_per_epoch=2,
        checkpoint_dir=str(ckpt),
        seed=0,
    )
    assert len(losses) == 2
    assert np.isfinite(losses).all()
    assert (ckpt / "checkpoint_0.npz").exists()
    assert (ckpt / "checkpoint_1.npz").exists()
    assert int(state.step) == 4

    # Checkpoints reload into the embedder.
    from pixelbox_tpu.models.efficientnet import EfficientNetEmbedder, load_params

    params = load_params(str(ckpt / "checkpoint_1.npz"))
    emb = EfficientNetEmbedder(dim=8, input_size=32, params=params)
    h = emb.mlhash(textured_image(seed=9, size=(48, 48)))
    assert h.shape == (8,)
